"""Multi-device sharding tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.parallel import make_mesh, replicate, shard_batch
from dasa_tpu.utils import Tokenizer, build_vocab


def test_mesh_and_sharding_helpers():
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    assert mesh.shape == {"data": 4, "model": 1}
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec[0] == "data"
    y = replicate({"w": np.ones(5)}, mesh)
    assert y["w"].sharding.is_fully_replicated


def test_dryrun_multichip_two_devices():
    """The driver's dryrun contract at n=2 (n=8 runs via __main__)."""
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_data_parallel_training_matches_single_device(connectivity_dir,
                                                      tmp_path):
    """Sharding the listener training step over a 4-device data mesh is
    the SAME program under GSPMD: at matched global batch the loss
    trajectory must match the single-device run to float tolerance
    (replaces the reference's DataParallel/DDP numerics contract,
    tasks/R2R/parallel.py:24-119)."""
    scan, scan2 = "17DRP5sb8fy", "2t7WUuJeko7"
    dim, L = 24, 24
    data_dir = str(tmp_path / "task")
    make_synthetic_task(data_dir, [scan], [scan2], n_train=16, n_val=4,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([scan, scan2], connectivity_dir,
                                     dim=dim)
    raw = load_datasets(["train"], data_dir)
    vocab = build_vocab(raw, min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    cfg = Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", consistent_drop=True,
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=dim, max_input=L, max_candidates=16, max_action=4,
        dropout=0.3, featdropout=0.3, batch_size=4, lr=3e-3, optim="adam",
        d_enc_hidden_size=16, d_hidden_size=32, d_vl_layers=1,
        d_la_layers=1, ml_weight=0.2, teacher_weight=1.0)

    def run(mesh):
        items = expand_instructions(load_datasets(["train"], data_dir),
                                    tok, max_input=cfg.max_input)
        env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                     connectivity_dir=connectivity_dir,
                     max_candidates=cfg.max_candidates,
                     max_input=cfg.max_input)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                             rng_seed=3, mesh=mesh)
        assert agent.use_device_rollout()
        agent.train(3, feedback="sample")
        return [float(np.asarray(x)) for x in agent.losses]

    single = run(None)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-5)
