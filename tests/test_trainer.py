"""End-to-end trainer smoke tests on tiny synthetic worlds: full
listener training interval + validation + checkpointing, auglistener
with speaker back-translation, validlistener submit dump."""

import json
import os

import numpy as np
import pytest

from dasa_tpu.config import Config
from dasa_tpu.data.datasets import make_synthetic_task
from dasa_tpu.train import trainer

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"


def tiny_cfg(data_dir, tmp, **kw):
    base = dict(
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=16, max_input=20, max_decode=20, max_candidates=16,
        max_action=6, dropout=0.3, featdropout=0.3, batch_size=4,
        lr=1e-3, optim="adam", d_enc_hidden_size=16, d_hidden_size=32,
        d_vl_layers=1, d_la_layers=1, iters=4, log_every=2, val_every=4,
        save_every=4, data_dir=data_dir, log_dir=os.path.join(tmp, "log"),
        snap_dir=os.path.join(tmp, "snap"),
        vocab_path=os.path.join(tmp, "vocab.txt"),
        feedback="sample", ml_weight=0.2,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def data_dir(connectivity_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(d, [SCAN], [SCAN2], n_train=8, n_val=4,
                        connectivity_dir=connectivity_dir)
    return d


def test_listener_train_and_validate(data_dir, tmp_path):
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_listener")
    agent = trainer.train(cfg)
    assert agent.iter_count >= 2
    ckpt = os.path.join(cfg.snap_dir, cfg.name, "state_dict",
                        "LAST_iter4")
    assert os.path.exists(ckpt)
    # validlistener from the checkpoint with submit
    vcfg = cfg.replace(load=ckpt, submit=True)
    out = trainer.valid(vcfg)
    assert "val_seen" in out and "val_unseen" in out
    assert 0.0 <= out["val_seen"]["success_rate"] <= 1.0
    sub = os.path.join(cfg.log_dir, cfg.name, "submit_val_seen.json")
    assert os.path.exists(sub)
    with open(sub) as f:
        results = json.load(f)
    assert all("instr_id" in r and "trajectory" in r for r in results)


def test_auglistener_with_back_translation(data_dir, tmp_path):
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_aug", aug="aug",
                   self_train=True, accumulate_grad=True, iters=2,
                   log_every=2, val_every=1000, save_every=1000)
    agent = trainer.train(cfg)
    assert agent.iter_count >= 1
    assert np.isfinite(agent.losses).all()


def test_beam_valid_end_to_end(data_dir, tmp_path):
    """Dijkstra-search validation through the CLI driver path: score
    mixing picks a trajectory per item and the evaluator accepts the
    exploration-prefixed submission."""
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_beam", candidates=2,
                   alpha=0.5, submit=True, batch_size=3, max_action=5)
    out = trainer.beam_valid(cfg)
    assert "val_seen" in out and "val_unseen" in out
    for summary in out.values():
        assert 0.0 <= summary["success_rate"] <= 1.0
        assert summary["lengths"] > 0  # exploration prefix counted
    sub = os.path.join(cfg.log_dir, cfg.name, "submit_val_seen.json")
    assert os.path.exists(sub)


def test_beam_valid_state_factored(data_dir, tmp_path):
    """cfg.search_type='state_factored' routes beam_valid through the
    speaker-follower search (follower.py:987-999) — same output
    contract, scoreable end-to-end."""
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_sfbeam",
                   candidates=2, alpha=0.5, batch_size=3, max_action=5,
                   search_type="state_factored", successor_size=3,
                   max_expansions=60)
    out = trainer.beam_valid(cfg)
    assert "val_seen" in out and "val_unseen" in out
    for summary in out.values():
        assert 0.0 <= summary["success_rate"] <= 1.0
        assert summary["lengths"] > 0


def test_speaker_trainer_mode(data_dir, tmp_path):
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_speaker", iters=4,
                   log_every=2, val_every=4, save_every=4)
    speaker = trainer.train_speaker(cfg)
    ckpt = os.path.join(cfg.snap_dir, cfg.name, "state_dict",
                        "LAST_iter4")
    assert os.path.exists(ckpt)
    vcfg = cfg.replace(load=ckpt)
    out = trainer.valid_speaker(vcfg)
    assert "val_seen" in out
    assert 0.0 <= out["val_seen"]["bleu"] <= 1.0


@pytest.mark.heavy
def test_listener_stream_train_and_validate(data_dir, tmp_path):
    """rollout_mode=stream through the FULL trainer path: streamed
    training windows (org env), streamed validation (stream_test_loop
    fills results for every val item), checkpointing, and a submit-able
    score — the trainer-level seam the agent-level stream tests skip."""
    cfg = tiny_cfg(data_dir, str(tmp_path), name="t_stream",
                   rollout_mode="stream", stream_steps=5,
                   encoder_type="Dic", include_vision=True)
    agent = trainer.train(cfg)
    assert agent.use_stream_rollout()
    assert agent.iter_count >= 2
    assert len(agent.logs["stream_consumed"])  # windows really streamed
    ckpt = os.path.join(cfg.snap_dir, cfg.name, "state_dict",
                        "LAST_iter4")
    assert os.path.exists(ckpt)
    vcfg = cfg.replace(load=ckpt)
    out = trainer.valid(vcfg)
    for env_name in ("val_seen", "val_unseen"):
        assert 0.0 <= out[env_name]["success_rate"] <= 1.0
        assert np.isfinite(out[env_name]["nav_error"])
