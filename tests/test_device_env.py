"""Device-resident env parity: the fused on-device rollout must
reproduce the host act/replay path exactly — observations, transitions,
and gradients (dasa_tpu/env/device_env.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import (
    expand_instructions,
    load_datasets,
    make_synthetic_task,
)
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.env.device_env import (
    DeviceEnvTables,
    device_obs,
    device_transition,
    episode_inputs,
)
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"
DIM = 24
L = 24


def tiny_cfg(**kw):
    base = dict(
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=DIM, max_input=L, max_candidates=16, max_action=4,
        dropout=0.3, featdropout=0.3, batch_size=4, lr=3e-3, optim="adam",
        d_enc_hidden_size=16, d_hidden_size=32, d_vl_layers=1,
        d_la_layers=1, ml_weight=0.2, teacher_weight=1.0,
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


def make_env(world, cfg, connectivity_dir):
    data_dir, feature_db, tok = world
    raw = load_datasets(["train"], data_dir)
    items = expand_instructions(raw, tok, max_input=cfg.max_input)
    return R2REnv(feature_db, items, batch_size=cfg.batch_size,
                  connectivity_dir=connectivity_dir,
                  max_candidates=cfg.max_candidates,
                  max_input=cfg.max_input)


OBS_KEYS = ("feat_row", "view_index", "heading", "elevation",
            "cand_point_id", "cand_heading", "cand_elevation", "cand_n",
            "teacher", "back_teacher", "distance", "progress")


def test_device_obs_matches_host_env(world, connectivity_dir):
    """Drive the host env along teacher actions; the device tables must
    produce the identical observation stream and transitions."""
    cfg = tiny_cfg(max_action=6)
    env = make_env(world, cfg, connectivity_dir)
    tables = DeviceEnvTables.build(env, cfg.max_candidates)
    obs = env.reset()
    ep = episode_inputs(env, tables)
    arrays = tables.arrays()
    node = jnp.asarray(ep["node0"])
    view = jnp.asarray(ep["view0"])
    goal = jnp.asarray(ep["goal"])
    start = jnp.asarray(ep["start"])
    goal_local = goal - arrays[8][goal]
    total = arrays[6][node, goal_local]
    ended = jnp.zeros(cfg.batch_size, bool)

    for t in range(cfg.max_action):
        dev = device_obs(arrays, node, view, goal, start, total,
                         cfg.max_candidates)
        for key in OBS_KEYS:
            np.testing.assert_allclose(
                np.asarray(dev[key]), getattr(obs, key), rtol=1e-5,
                atol=1e-5, err_msg=f"{key} at t={t}")
        a = obs.teacher
        node, view, stop = device_transition(
            arrays, node, view, jnp.asarray(a), ended)
        ended = ended | stop
        a_env = np.where(a >= obs.cand_n, -1, a)
        obs = env.step(a_env)
        if np.asarray(ended).all():
            break


@pytest.mark.parametrize("feedback,max_action", [
    pytest.param("teacher", 4, marks=pytest.mark.heavy),
    ("sample", 4),  # the fast-tier representative
    # max_action > 8 exercises the in-program {8, T} bucket cond: the
    # teacher walk ends within 8 steps (short branch) while the
    # untrained sampling policy wanders past 8 (long branch), each of
    # which must match the host's bucket choice and rng folds
    pytest.param("teacher", 12, marks=pytest.mark.heavy),
    pytest.param("sample", 12, marks=pytest.mark.heavy),
])
def test_device_rollout_grads_match_host(world, connectivity_dir,
                                         feedback, max_action):
    """The fused device program and the host act/replay path compute the
    same gradients for the same episodes and rng stream (the device
    act phase and the vmapped-percept replay are the same math)."""
    cfg_kw = dict(encoder_type="Dic", include_vision=True,
                  adain_type="channel", ab_type="a", a_type="sigmoid",
                  consistent_drop=True, max_action=max_action,
                  batch_size=2)
    data_dir, feature_db, tok = world

    def grads_with(mode):
        cfg = tiny_cfg(device_rollout=mode, **cfg_kw)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
        agent.zero_grad()
        agent.accumulate_gradient(feedback)
        agent.flush_replays()
        loss = float(np.sum([np.asarray(x) for x in agent.losses]))
        return jax.tree_util.tree_leaves(agent._grad_accum), loss

    g_host, l_host = grads_with("never")
    g_dev, l_dev = grads_with("auto")
    assert np.isfinite(l_dev)
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-4)
    for a, b in zip(g_host, g_dev):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)


def test_device_eval_matches_host_trajectories(world, connectivity_dir):
    """The single-program device evaluation must reproduce the host
    act-loop's argmax trajectories exactly, micro-steps included."""
    cfg_kw = dict(encoder_type="Dic", include_vision=True,
                  adain_type="channel", ab_type="a", a_type="sigmoid",
                  consistent_drop=True, max_action=6, batch_size=2)
    data_dir, feature_db, tok = world

    def results_with(mode):
        cfg = tiny_cfg(device_rollout=mode, **cfg_kw)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                             rng_seed=11)
        out = {r["instr_id"]: r["trajectory"]
               for r in agent.test(feedback="argmax")}
        return out, agent

    host, agent_h = results_with("never")
    dev, agent_d = results_with("auto")
    assert agent_d.use_device_rollout() and not agent_h.use_device_rollout()
    assert dev.keys() == host.keys()
    for iid in host:
        assert dev[iid] == host[iid], iid
    assert agent_d.total_env_steps == agent_h.total_env_steps


def test_remat_modes_are_grad_exact(world, connectivity_dir):
    """remat never/percept/always select WHERE activations are saved vs
    recomputed during backward — a pure performance knob; gradients must
    be identical."""
    cfg_kw = dict(encoder_type="Dic", include_vision=True,
                  adain_type="channel", ab_type="a", a_type="sigmoid",
                  consistent_drop=True, max_action=4, batch_size=2)
    data_dir, feature_db, tok = world

    def grads_with(remat):
        cfg = tiny_cfg(remat=remat, **cfg_kw)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                             rng_seed=5)
        agent.zero_grad()
        agent.device_rollout(train_ml=None, train_rl=True,
                             feedback="sample")
        return jax.tree_util.tree_leaves(agent._grad_accum)

    base = grads_with("never")
    for mode in ("percept", "always"):
        for a, b in zip(base, grads_with(mode)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-7)


def test_device_rollout_training_reduces_loss(world, connectivity_dir):
    cfg = tiny_cfg(max_action=4)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_device_rollout()
    losses = []
    for _ in range(12):
        agent.zero_grad()
        agent.device_rollout(train_ml=1.0, train_rl=False,
                             feedback="teacher")
        agent.optim_step()
        losses.append(float(np.asarray(agent.losses[-1])))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9, losses
    assert agent.env_steps_total() > 0


@pytest.mark.heavy
def test_device_selftrain_grads_match_host(world, connectivity_dir):
    """selfTrain back-translation on the fused device paths
    (agent_dg.py:656-675): the speaker relabels the minibatch BEFORE
    the episode, so the fast path stays fused.  The split device
    program must reproduce the host act/replay gradients exactly
    (same rng stream, same shared featdrop mask, same greedy speaker
    decode); the combined 2B-wide program must also relabel and train
    (its noise stream legitimately differs — CLAUDE.md)."""
    from dasa_tpu.agents.speaker import SpeakerAgent

    cfg_kw = dict(encoder_type="Dic", include_vision=True,
                  adain_type="channel", ab_type="a", a_type="sigmoid",
                  consistent_drop=True, max_action=4, batch_size=2,
                  self_train=True)
    data_dir, feature_db, tok = world

    def grads_with(mode, fuse):
        cfg = tiny_cfg(device_rollout=mode, fuse_passes=fuse, **cfg_kw)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
        speaker = SpeakerAgent(cfg, env, feature_db,
                               vocab_size=len(tok), tok=tok)
        orig = {it["instr_id"]: np.asarray(it["instr_encoding"]).copy()
                for it in env.data}
        agent.zero_grad()
        agent.accumulate_gradient("sample", speaker=speaker)
        agent.flush_replays()
        # relabel_batch swaps copies into env.batch; originals untouched
        changed = [it for it in env.batch
                   if not np.array_equal(
                       np.asarray(it["instr_encoding"]).reshape(-1),
                       orig[it["instr_id"]].reshape(-1))]
        assert changed, "speaker did not replace the instructions"
        loss = float(np.sum([np.asarray(x) for x in agent.losses]))
        return jax.tree_util.tree_leaves(agent._grad_accum), loss

    g_host, l_host = grads_with("never", "never")
    g_dev, l_dev = grads_with("auto", "never")
    assert np.isfinite(l_dev)
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-4)
    for a, b in zip(g_host, g_dev):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    # combined 2B-wide program with back-translation: runs + finite
    _g_comb, l_comb = grads_with("auto", "auto")
    assert np.isfinite(l_comb)


@pytest.mark.parametrize("unfreeze", [False, True])
def test_finetune_flag_unfreezes_cross_stack(world, connectivity_dir,
                                             unfreeze):
    """--d_update_add_layer (the finetune ladder, README.md:101-118)
    must actually unfreeze the cross-modal stack's grads through the
    combined program — and leave them stop-gradient'd (zero) when off.
    The text stack stays frozen either way (d_transformer_update off).
    The analytic bench FLOPs formula gates on exactly this behavior."""
    cfg = tiny_cfg(encoder_type="Dic", include_vision=True,
                   adain_type="channel", ab_type="a", a_type="sigmoid",
                   consistent_drop=True, max_action=4, batch_size=2,
                   fuse_passes="auto", d_update_add_layer=unfreeze)
    data_dir, feature_db, tok = world
    env = make_env(world, cfg, connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_combined_rollout()
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    grads = jax.tree_util.tree_map(np.asarray, agent._grad_accum)
    bert = grads["encoder"]["bert"]

    def total(tree):
        return float(np.sum([np.abs(g).sum()
                             for g in jax.tree_util.tree_leaves(tree)]))

    cross = total(bert["addlayer_0"]) + total(bert["vision_encoder"])
    text = total(bert["lalayer_0"])
    decoder = total(grads["decoder"])
    assert decoder > 0
    assert text == 0.0, "text stack must stay frozen"
    if unfreeze:
        assert cross > 0, "finetune flag did not unfreeze the cross stack"
    else:
        assert cross == 0.0, "cross stack trained with the flag off"
