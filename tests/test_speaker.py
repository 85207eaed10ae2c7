"""Speaker tests: teacher-forcing training convergence, inference,
back-translation relabeling, BLEU plumbing."""

import numpy as np
import pytest

from dasa_tpu.agents.speaker import SpeakerAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.train import Evaluation
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
DIM = 24
L = 24


@pytest.fixture(scope="module")
def world(connectivity_dir, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(data_dir, [SCAN], [SCAN], n_train=10, n_val=4,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([SCAN], connectivity_dir, dim=DIM)
    raw = load_datasets(["train"], data_dir)
    vocab = build_vocab(raw, min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    cfg = Config(rnn_dim=32, wemb=16, aemb=8, angle_feat_size=8,
                 feature_size=DIM, max_input=L, max_decode=L,
                 max_candidates=16, max_action=8, dropout=0.2,
                 featdropout=0.2, batch_size=4, lr=3e-3, optim="adam")
    items = expand_instructions(raw, tok, max_input=L)
    env = R2REnv(feature_db, items, batch_size=4,
                 connectivity_dir=connectivity_dir, max_candidates=16,
                 max_input=L, name="train")
    return cfg, env, feature_db, tok, raw


def test_speaker_training_reduces_loss(world):
    cfg, env, feature_db, tok, raw = world
    sp = SpeakerAgent(cfg, env, feature_db, vocab_size=len(tok), tok=tok)
    losses = sp.train(14)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.95, losses


def test_speaker_infer_and_relabel(world):
    cfg, env, feature_db, tok, raw = world
    sp = SpeakerAgent(cfg, env, feature_db, vocab_size=len(tok), tok=tok)
    env.reset()
    words = sp.infer_batch()
    assert words.shape == (4, cfg.max_decode)
    assert words.dtype in (np.int32, np.int64)
    # relabel: instructions replaced and re-encoded
    import jax.numpy as jnp
    import jax

    noise = jnp.ones((cfg.feature_size,))
    old_instr = [item["instructions"] for item in env.batch]
    obs = sp.relabel_batch(env, noise, jax.random.PRNGKey(0))
    assert obs.instr.shape[0] == 4
    for item in env.batch:
        assert "instr_encoding" in item


def test_speaker_valid_and_bleu(world):
    cfg, env, feature_db, tok, raw = world
    sp = SpeakerAgent(cfg, env, feature_db, vocab_size=len(tok), tok=tok)
    path2inst, loss, word_accu, sent_accu = sp.valid()
    assert len(path2inst) == env.size() // 3  # 3 instructions per path
    ev = Evaluation(raw, splits=["train"])
    bleu, precisions = ev.bleu_score(path2inst, tok)
    assert 0.0 <= bleu <= 1.0

def test_speaker_beam_decode(world):
    """Beam decode (reference model.py:1060-1071 beam expansion):
    beam_size=1 reproduces greedy exactly; K=3 returns per-item
    hypotheses sorted best-first with valid EOS/PAD structure."""
    cfg, env, feature_db, tok, raw = world
    sp = SpeakerAgent(cfg, env, feature_db, vocab_size=len(tok), tok=tok)
    env.reset()
    greedy = sp.infer_batch()
    env.reset_epoch()
    env.reset()
    words1, scores1 = sp.beam_infer_batch(beam_size=1)
    np.testing.assert_array_equal(words1[:, 0], greedy)

    env.reset_epoch()
    env.reset()
    words, scores = sp.beam_infer_batch(beam_size=3)
    assert words.shape == (4, 3, cfg.max_decode)
    assert scores.shape == (4, 3)
    # sorted best-first, and nothing after EOS but PAD
    eos = tok.word_to_index["<EOS>"]
    for b in range(4):
        assert all(scores[b][k] >= scores[b][k + 1] - 1e-5
                   for k in range(2))
        for k in range(3):
            seq = list(words[b, k])
            if eos in seq:
                tail = seq[seq.index(eos) + 1:]
                assert all(w == 0 for w in tail)
    # beams are distinct hypotheses for at least one item
    assert any(not np.array_equal(words[b, 0], words[b, 1])
               for b in range(4))


def test_speaker_decoder_multiplier(world):
    """The decoder's beam-expansion multiplier scores a (B*m) word batch
    against a B-row ctx identically to manual per-row repetition."""
    import jax
    import jax.numpy as jnp

    from dasa_tpu.models.speaker import SpeakerDecoder

    rng = np.random.default_rng(0)
    b, m, t, lw, hd, v = 2, 3, 4, 5, 16, 30
    dec = SpeakerDecoder(v, 8, hd, 0.0)
    words = jnp.asarray(rng.integers(1, v, (b * m, lw)), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((b, t, hd)), jnp.float32)
    ctx_mask = jnp.asarray(np.array([[False] * t, [False, False, True,
                                                   True]]))
    h0 = jnp.zeros((b * m, hd))
    params = dec.init(jax.random.PRNGKey(0), words, ctx, ctx_mask, h0, h0)
    out = dec.apply(params, words, ctx, ctx_mask, h0, h0)
    out_manual = dec.apply(params, words, jnp.repeat(ctx, m, 0),
                           jnp.repeat(ctx_mask, m, 0), h0, h0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_manual),
                               rtol=1e-5, atol=1e-6)


def test_make_aug_paths_generator(world, connectivity_dir,
                                  tmp_path_factory):
    """scripts/make_aug_paths.py produces a loadable speaker-annotated
    aug split: new shortest paths only (none from train), valid hop
    structure, non-empty instructions, consumable by the aug loader.
    (The reference only DOWNLOADS aug_paths.json; generation is the
    speaker-follower package's role — tasks/R2R/speaker/ — closed here
    by the dasa_tpu speaker.)"""
    import json
    import os

    from scripts.make_aug_paths import main as gen_main

    from dasa_tpu.data.datasets import make_synthetic_task
    from dasa_tpu.sim.graph import load_scan_graph

    data_dir = str(tmp_path_factory.mktemp("augtask"))
    make_synthetic_task(data_dir, [SCAN], [SCAN], n_train=8, n_val=2,
                        connectivity_dir=connectivity_dir)
    out = os.path.join(data_dir, "R2R_aug_gen.json")
    items = gen_main([
        "--out", out, "--n_per_scan", "5",
        "--min_hops", "3", "--max_hops", "5",
        "--data_dir", data_dir, "--connectivity_dir", connectivity_dir,
        "--batch_size", "4", "--rnn_dim", "32", "--wemb", "16",
        "--aemb", "8", "--angle_feat_size", "8",
        "--feature_size", str(DIM), "--max_input", str(L),
        "--max_decode", str(L), "--max_action", "8"])
    assert len(items) == 5
    with open(out) as f:
        written = json.load(f)
    assert written == items

    train = load_datasets(["train"], data_dir)
    train_paths = {(it["scan"], tuple(it["path"])) for it in train}
    g = load_scan_graph(SCAN, connectivity_dir)
    adj = g.nav_adjacency()
    ix = {vid: i for i, vid in enumerate(g.ids)}
    for it in items:
        assert (it["scan"], tuple(it["path"])) not in train_paths
        assert 4 <= len(it["path"]) <= 6      # hops+1
        for a, b in zip(it["path"], it["path"][1:]):
            assert adj[ix[a], ix[b]], (a, b)  # consecutive hops adjacent
        assert it["instructions"][0]          # loadable by the tokenizer

    # the generated split feeds the aug pipeline
    vocab = build_vocab(train, min_count=1)
    tok2 = Tokenizer(vocab, encoding_length=L)
    expanded = expand_instructions(items, tok2, max_input=L)
    assert len(expanded) == len(items)
