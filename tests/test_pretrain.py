"""Pretraining tests: record generation, masking stats, MLM+action
training convergence under the data-parallel mesh."""

import jax
import numpy as np
import pytest

from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.parallel import make_mesh
from dasa_tpu.pretrain import (
    PretrainBatcher,
    generate_pretrain_records,
    mask_tokens,
)
from dasa_tpu.pretrain.trainer import Pretrainer
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
DIM = 16
L = 20


@pytest.fixture(scope="module")
def world(connectivity_dir, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(data_dir, [SCAN], [SCAN], n_train=8, n_val=4,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=DIM)
    raw = load_datasets(["train"], data_dir)
    vocab = build_vocab(raw, min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    tok.add_word("<MASK>")
    items = expand_instructions(raw, tok, max_input=L)
    env = R2REnv(feature_db, items, batch_size=4,
                 connectivity_dir=connectivity_dir, max_input=L)
    return env, feature_db, tok


def test_record_generation(world):
    env, feature_db, tok = world
    records = generate_pretrain_records(env, max_steps=10)
    # one record per step per item; paths are 3-6 hops (+ goal record)
    assert len(records) >= env.size() * 4
    for r in records[:10]:
        assert 0 <= r["action"] < 36
        assert 0.0 <= r["progress"] <= 1.0 + 1e-6


def test_masking_distribution(world):
    env, feature_db, tok = world
    import random

    rng = random.Random(0)
    tokens = np.arange(2, 2 + L).astype(np.int64)
    n_masked = 0
    n_masktok = 0
    trials = 300
    for _ in range(trials):
        t, l = mask_tokens(tokens, L, len(tok),
                           tok.word_to_index["<MASK>"], rng)
        assert l[0] == -1 and l[L - 1] == -1  # ends never masked
        changed = l >= 0
        n_masked += changed.sum()
        n_masktok += (t == tok.word_to_index["<MASK>"]).sum()
        np.testing.assert_array_equal(tokens[~changed], t[~changed])
    rate = n_masked / (trials * (L - 2))
    assert 0.10 < rate < 0.20
    assert 0.7 < n_masktok / max(n_masked, 1) < 0.9  # ~80% -> [MASK]


@pytest.mark.heavy
def test_pretrain_step_reduces_loss(world):
    env, feature_db, tok = world
    cfg = Config(feature_size=DIM, angle_feat_size=8, max_input=L,
                 batch_size=8, d_la_layers=1, d_vl_layers=1, lr=3e-4,
                 warm_steps=5, iters=60, encoder_type="Dic")
    records = generate_pretrain_records(env, max_steps=10)
    batcher = PretrainBatcher(records, cfg.batch_size, len(tok),
                              tok.word_to_index["<MASK>"])
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    pt = Pretrainer(cfg, feature_db, len(tok), mesh=mesh)
    pt.shard_inputs()
    rng = jax.random.PRNGKey(0)
    losses = []
    it = 0
    for _ in range(6):
        for batch in batcher.epoch():
            loss, aux = pt.train_step(batch, jax.random.fold_in(rng, it))
            losses.append(loss)
            it += 1
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
    # bert subtree exportable for the listener encoder
    bert = pt.export_bert_params()
    assert "embeddings" in bert and "addlayer_0" in bert


def test_pretrain_evaluate(world):
    env, feature_db, tok = world
    cfg = Config(feature_size=DIM, angle_feat_size=8, max_input=L,
                 batch_size=8, d_la_layers=1, d_vl_layers=1,
                 encoder_type="Dic")
    records = generate_pretrain_records(env, max_steps=10)
    batcher = PretrainBatcher(records, cfg.batch_size, len(tok),
                              tok.word_to_index["<MASK>"])
    pt = Pretrainer(cfg, feature_db, len(tok))
    pt.shard_inputs()
    out = pt.evaluate(batcher, max_batches=3)
    assert set(out) == {"loss", "mlm_acc", "act_acc"}
    assert 0.0 <= out["mlm_acc"] <= 1.0
    assert np.isfinite(out["loss"])

def test_isnext_sampling_distribution(world):
    """isnext negative sampling (batch_loader.py:419-432): ~50/50 labels;
    positive rows keep the true next view, negative rows swap in a
    different view index at the same next viewpoint."""
    env, feature_db, tok = world
    records = generate_pretrain_records(env, max_steps=10)
    assert all("next_feat_row" in r for r in records)
    # non-terminal records advance the state
    moved = [r for r in records if r["next_view_index"] != r["view_index"]
             or r["next_feat_row"] != r["feat_row"]]
    assert len(moved) > 0
    real_next = {}
    batcher = PretrainBatcher(records, 4, len(tok),
                              tok.word_to_index["<MASK>"], seed=3)
    for r in records:
        key = (tuple(np.asarray(r["instr_encoding"]).tolist()),
               r["feat_row"], r["view_index"])
        real_next[key] = (r["next_feat_row"], r["next_view_index"])
    n_pos = n_tot = 0
    for _ in range(25):
        for batch in batcher.epoch():
            assert {"isnext", "next_feat_row", "next_view"} <= set(batch)
            for j in range(len(batch["isnext"])):
                key = (tuple(batch["lang_mask"][j] * 0 + 0),)  # unused
                n_tot += 1
                n_pos += int(batch["isnext"][j])
                nfr, nv = (int(batch["next_feat_row"][j]),
                           int(batch["next_view"][j]))
                assert 0 <= nv < 36
    assert 0.42 < n_pos / n_tot < 0.58
    # per-batch: negatives never equal the recorded true next view
    rng_batches = list(batcher.epoch())
    by_key = {}
    for r in records:
        by_key[(r["feat_row"], r["view_index"], r["action"])] = \
            r["next_view_index"]
    for batch in rng_batches:
        for j in range(len(batch["isnext"])):
            true_v = by_key.get((int(batch["feat_row"][j]),
                                 int(batch["view_index"][j]),
                                 int(batch["action"][j])))
            if true_v is None:
                continue
            if batch["isnext"][j] == 1:
                assert int(batch["next_view"][j]) == true_v
            else:
                assert int(batch["next_view"][j]) != true_v


@pytest.mark.heavy
def test_pretrain_isnext_reduces_loss(world):
    env, feature_db, tok = world
    cfg = Config(feature_size=DIM, angle_feat_size=8, max_input=L,
                 batch_size=8, d_la_layers=1, d_vl_layers=1, lr=3e-4,
                 warm_steps=5, iters=60, encoder_type="Dic",
                 pretrain_isnext=True)
    records = generate_pretrain_records(env, max_steps=10)
    batcher = PretrainBatcher(records, cfg.batch_size, len(tok),
                              tok.word_to_index["<MASK>"])
    pt = Pretrainer(cfg, feature_db, len(tok))
    pt.shard_inputs()
    rng = jax.random.PRNGKey(0)
    losses = []
    it = 0
    for _ in range(6):
        for batch in batcher.epoch():
            loss, aux = pt.train_step(batch, jax.random.fold_in(rng, it))
            assert "isnext_acc" in aux
            losses.append(loss)
            it += 1
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
