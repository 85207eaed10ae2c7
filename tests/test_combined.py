"""Combined-pass device program: running the teacher-ML and policy-RL
passes of one accumulate pair as ONE 2B-wide slot-weighted program must
reproduce the two split programs' summed gradients exactly whenever no
shape-dependent noise is drawn (flax dropout masks and categorical
draws depend on the batch shape; everything else — consistent env-drop
noise, episode streams, weighting, normalization — is slot-exact).

Reference semantics being preserved: agent_dg.py:1347-1384 (the
accumulate_gradient teacher+sample pair feeding one optim_step)."""

import numpy as np
import pytest

import jax

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"
DIM = 24
L = 24


def tiny_cfg(**kw):
    base = dict(
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=DIM, max_input=L, max_candidates=16, max_action=5,
        dropout=0.0, featdropout=0.3, batch_size=3, lr=3e-3,
        optim="adam", d_enc_hidden_size=16, d_hidden_size=32,
        d_vl_layers=1, d_la_layers=1, ml_weight=0.2, teacher_weight=1.0,
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", consistent_drop=True,
        # zero every shape-dependent noise source: flax dropout masks
        # over a (2B, ...) batch cannot bitwise-match two (B, ...)
        # draws (consistent env-drop noise CAN — it is a (F,) vector
        # per pass, applied per-slot in the combined program)
        d_dropout_ratio=0.0, d_hidden_dropout_prob=0.0,
        d_attn_dropout_prob=0.0,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def world(connectivity_dir, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("task"))
    make_synthetic_task(data_dir, [SCAN], [SCAN2], n_train=16, n_val=4,
                        connectivity_dir=connectivity_dir)
    feature_db = FeatureDB.synthetic([SCAN, SCAN2], connectivity_dir,
                                     dim=DIM)
    train_raw = load_datasets(["train"], data_dir)
    vocab = build_vocab(train_raw, min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    return data_dir, feature_db, tok


def make_agent(world, cfg, connectivity_dir, seed=7):
    data_dir, feature_db, tok = world
    raw = load_datasets(["train"], data_dir)
    items = expand_instructions(raw, tok, max_input=cfg.max_input)
    env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                 connectivity_dir=connectivity_dir,
                 max_candidates=cfg.max_candidates,
                 max_input=cfg.max_input)
    return Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                        rng_seed=seed)


@pytest.mark.parametrize("extra", [
    {},
    {"pred_pm": True, "pm_type": "att", "pred_back": True},
    {"normalize_loss": "batch"},
    # max_action > teacher_len: the combined program narrows to the
    # sample half for steps [t1, T) — must still match the split sum
    pytest.param({"max_action": 14}, marks=pytest.mark.heavy),
    # T - t1 >= 4 and B >= 4: the runtime-compacted half-width tail
    # (lax.cond + gather) compiles in and must stay exact whichever
    # branch fires
    pytest.param({"max_action": 16, "batch_size": 4},
                 marks=pytest.mark.heavy),
    # the MT agent's soft-distance KL term: combined computes it as
    # per-half means x the half's ml row weight — must equal the split
    # programs' per-pass means (incl. through the segmented tail)
    pytest.param({"agent_type": "mt", "max_action": 14},
                 marks=pytest.mark.heavy),
])
def test_combined_matches_split_pass_sum(world, connectivity_dir, extra):
    """grads(combined 2B program) == grads(teacher pass) + grads(argmax
    pass) for the same episode minibatches and rng stream.  argmax
    stands in for sample so the policy-half actions are deterministic
    (a categorical draw over (2B, k) cannot bitwise-match one over
    (B, k)); the RL loss path is fully exercised (rl_weight=1)."""
    cfg = tiny_cfg(**extra)

    # --- split: teacher grad + argmax(RL) grad, summed ---------------
    a1 = make_agent(world, cfg, connectivity_dir)
    args_t = a1._device_rollout_args("teacher", 0.2, False)
    g_t, logs_t = a1._device_grad_fn("teacher", True)(
        a1.params, a1.tables, a1._dev_env.arrays(), *args_t)
    args_s = a1._device_rollout_args("argmax", None, True)
    g_s, logs_s = a1._device_grad_fn("argmax", True)(
        a1.params, a1.tables, a1._dev_env.arrays(), *args_s)
    g_split = jax.tree_util.tree_map(lambda x, y: np.asarray(x)
                                     + np.asarray(y), g_t, g_s)

    # --- combined: one 2B-wide program -------------------------------
    a2 = make_agent(world, cfg, connectivity_dir)
    if extra.get("max_action"):  # the segmented-path case must be real
        assert a2._teacher_len() < cfg.max_action
    args_c = a2._device_combined_args("argmax", 0.2, True)
    g_c, logs_c = a2._device_combined_grad_fn("argmax", True, False)(
        a2.params, a2.tables, a2._dev_env.arrays(), *args_c)

    assert int(logs_c["env_steps"]) == int(logs_t["env_steps"]) \
        + int(logs_s["env_steps"])
    l_split = float(logs_t["loss"]) + float(logs_s["loss"])
    np.testing.assert_allclose(float(logs_c["loss"]), l_split,
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g_split),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_combined_accumulate_trains(world, connectivity_dir):
    """The fuse_passes=auto path wires into accumulate_gradient: one
    dispatch per accumulate pair, finite losses, and training moves the
    parameters."""
    cfg = tiny_cfg(fuse_passes="auto", dropout=0.1, featdropout=0.3)
    agent = make_agent(world, cfg, connectivity_dir)
    assert agent.use_combined_rollout()
    p0 = jax.tree_util.tree_leaves(agent.params["params"])[0].copy()
    for _ in range(3):
        agent.zero_grad()
        agent.accumulate_gradient("sample", ml_weight=0.2)
        assert agent._grad_accum is not None
        agent.optim_step()
    assert all(np.isfinite(float(np.asarray(x))) for x in agent.losses)
    p1 = jax.tree_util.tree_leaves(agent.params["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # one combined dispatch per accumulate pair (3 iters -> 3 entries)
    assert len(agent._env_steps_log) == 3


def test_combined_grad_accumulates_across_envs(world, connectivity_dir):
    """Aug alternation accumulates a second combined pair into the same
    grads (the in-program add variant)."""
    cfg = tiny_cfg(fuse_passes="auto")
    agent = make_agent(world, cfg, connectivity_dir)
    agent.zero_grad()
    agent.accumulate_gradient("sample", ml_weight=0.2)
    g1 = [np.asarray(x).copy() for x in
          jax.tree_util.tree_leaves(agent._grad_accum)]
    agent.accumulate_gradient("sample", ml_weight=0.6)
    g2 = jax.tree_util.tree_leaves(agent._grad_accum)
    changed = sum(not np.allclose(a, np.asarray(b))
                  for a, b in zip(g1, g2))
    assert changed > 0
