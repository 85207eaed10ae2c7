"""Streaming rollouts (dasa_tpu/agents/stream.py): the continuous-
batching training regime must leave per-episode semantics unchanged —
trajectories, A2C return cuts, and exactly-once data consumption — while
only the optimizer-step granularity differs from the episodic programs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.agents.stream import stream_returns
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
        dropout=0.0, featdropout=0.0, batch_size=4, lr=3e-3,
        optim="adam", d_enc_hidden_size=16, d_hidden_size=32,
        d_vl_layers=1, d_la_layers=1, ml_weight=0.2, teacher_weight=1.0,
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", consistent_drop=False,
        rollout_mode="stream", stream_steps=6, stream_pool=8,
        # rng-free forward: trajectory equality vs the standalone
        # oracle requires every dropout site inert (the stream and the
        # oracle fold rngs at different positions by design)
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


def make_env(world, cfg, connectivity_dir):
    data_dir, feature_db, tok = world
    raw = load_datasets(["train"], data_dir)
    items = expand_instructions(raw, tok, max_input=cfg.max_input)
    return R2REnv(feature_db, items, batch_size=cfg.batch_size,
                  connectivity_dir=connectivity_dir,
                  max_candidates=cfg.max_candidates,
                  max_input=cfg.max_input)


# ---------------------------------------------------------------------
# stream_returns vs a per-episode oracle
# ---------------------------------------------------------------------
def _returns_oracle(rewards, values, done, trunc, real, g_init, gamma):
    """Per-slot-column forward reconstruction: split each column into
    episodes at done/trunc cuts, compute discounted returns per episode
    with the appropriate bootstrap (0 at STOP, critic value at a trunc
    row or at the window edge)."""
    S, W = rewards.shape
    G = np.zeros((S, W), np.float64)
    for w in range(W):
        g = g_init[w]  # window-edge bootstrap for a mid-flight episode
        for t in reversed(range(S)):
            if trunc[t, w]:
                # bookkeeping row: the step before it bootstraps from
                # the critic value recorded here
                G[t, w] = rewards[t, w] + gamma * g
                g = values[t, w]
            elif done[t, w]:
                G[t, w] = rewards[t, w]
                g = G[t, w]
            elif real[t, w]:
                G[t, w] = rewards[t, w] + gamma * g
                g = G[t, w]
            else:
                G[t, w] = rewards[t, w] + gamma * g  # masked downstream
    return G


def test_stream_returns_matches_oracle():
    rng = np.random.default_rng(0)
    S, W, gamma = 12, 6, 0.9
    rewards = rng.normal(size=(S, W)).astype(np.float32)
    values = rng.normal(size=(S, W)).astype(np.float32)
    # build per-column episode structure: alternating real runs ended
    # by done or trunc, with dead gaps
    real = rng.random((S, W)) < 0.8
    done = np.zeros((S, W), bool)
    trunc = np.zeros((S, W), bool)
    for w in range(W):
        for t in range(S):
            if real[t, w] and rng.random() < 0.3:
                done[t, w] = True
        # one trunc bookkeeping row per column at a non-real position
        cand = np.nonzero(~real[:, w])[0]
        if len(cand):
            trunc[cand[0], w] = True
            real[cand[0], w] = False
    g_init = np.where(rng.random(W) < 0.5, rng.normal(size=W), 0.0)

    got = np.asarray(stream_returns(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(done),
        jnp.asarray(trunc), jnp.asarray(real), jnp.asarray(g_init),
        gamma))
    want = _returns_oracle(rewards, values, done, trunc, real, g_init,
                           gamma)
    mask = real  # only real rows enter any loss
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5,
                               atol=1e-5)


def test_stream_returns_no_cross_episode_leak():
    """A reward perturbation inside one episode must not change the
    returns of the episode before it in the same slot column."""
    S, W, gamma = 8, 1, 0.9
    rewards = np.ones((S, W), np.float32)
    values = np.zeros((S, W), np.float32)
    real = np.ones((S, W), bool)
    done = np.zeros((S, W), bool)
    trunc = np.zeros((S, W), bool)
    done[3, 0] = True  # episode 1 = steps 0..3, episode 2 = steps 4..7
    g0 = np.zeros(W)

    base = np.asarray(stream_returns(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(done),
        jnp.asarray(trunc), jnp.asarray(real), jnp.asarray(g0), gamma))
    rewards2 = rewards.copy()
    rewards2[5, 0] = 100.0
    pert = np.asarray(stream_returns(
        jnp.asarray(rewards2), jnp.asarray(values), jnp.asarray(done),
        jnp.asarray(trunc), jnp.asarray(real), jnp.asarray(g0), gamma))
    np.testing.assert_allclose(pert[:4, 0], base[:4, 0])
    assert pert[4, 0] != base[4, 0]


# ---------------------------------------------------------------------
# streamed trajectories == standalone rollouts
# ---------------------------------------------------------------------
def _collect_episodes(records):
    """Concatenate per-window (S, W) records along time and split each
    slot column into per-uid episodes (rec_uid is constant over an
    episode's real steps)."""
    cat = {k: np.concatenate([r[k] for r in records], 0)
           for k in records[0]}
    S, W = cat["rec_action"].shape
    eps = {}
    for w in range(W):
        for t in range(S):
            if not cat["rec_real"][t, w]:
                continue
            uid = int(cat["rec_uid"][t, w])
            if uid < 0:
                continue
            ep = eps.setdefault(uid, {"slot": w, "actions": [],
                                      "nodes": [], "done": False,
                                      "trunc": False})
            assert ep["slot"] == w, "episode split across slots"
            ep["actions"].append(int(cat["rec_action"][t, w]))
            ep["nodes"].append(int(cat["rec_node"][t, w]))
            if cat["rec_done"][t, w]:
                ep["done"] = True
    for w in range(W):
        for t in range(S):
            if cat["rec_trunc"][t, w]:
                uid = int(cat["rec_uid"][t, w])
                if uid in eps:
                    eps[uid]["trunc"] = True
    return eps


def _batched_oracle(agent, rows, is_sample, T):
    """Standalone per-episode rollouts, batched over all episodes at
    once: the same per-step applies the stream program makes, one
    episode per row from a fresh decoder state.  Dropout rates are 0 in
    the test config, so the rng stream is irrelevant and the forward
    matches the streamed one bit-for-bit in structure."""
    from dasa_tpu.agents.seq2seq import INIT_SALT, make_step_inputs
    from dasa_tpu.env.device_env import device_obs, device_transition
    from dasa_tpu.models import DasaPolicy, DecoderState
    from dasa_tpu.models.layers import NEG_INF
    from dasa_tpu.models.policy import decoder_state_width

    cfg = agent.cfg
    policy = agent.policy
    arrays = agent._dev_env.arrays()
    k = cfg.max_candidates
    n = len(rows)
    instr = jnp.asarray(np.stack([r["instr"] for r in rows]))
    valid = jnp.asarray(np.stack([r["valid"] for r in rows]))
    seq_len = jnp.asarray(np.stack([r["seq_len"] for r in rows]))
    node = jnp.asarray(np.stack([r["node0"] for r in rows]))
    view = jnp.asarray(np.stack([r["view0"] for r in rows]))
    goal = jnp.asarray(np.stack([r["goal"] for r in rows]))
    start = jnp.asarray(np.stack([r["start"] for r in rows]))
    is_sample = jnp.asarray(is_sample)
    rng = jax.random.PRNGKey(0)  # inert: all dropout rates are 0

    @jax.jit
    def run(params):
        inner = params["params"]
        cached = policy.apply(
            params, instr, valid, seq_len, deterministic=False,
            rngs={"dropout": jax.random.fold_in(rng, INIT_SALT)},
            method=DasaPolicy.encode_text)
        dist_t, node_base_t = arrays[6], arrays[8]
        goal_local = goal - node_base_t[goal]
        total = dist_t[node, goal_local]
        dec_h = decoder_state_width(cfg)
        state = DecoderState(
            h=jnp.zeros((n, dec_h), agent.dtype),
            c=jnp.zeros((n, dec_h), agent.dtype),
            h1=jnp.zeros((n, dec_h), agent.dtype))

        def step(carry, t):
            node, view, state, ended = carry
            sobs = device_obs(arrays, node, view, goal, start, total, k)
            inputs = make_step_inputs(cfg, agent.tables, sobs)
            percept = policy.apply(
                params, cached, valid, seq_len, inputs,
                deterministic=False, is_test=False, env_noise=None,
                rngs={"dropout": jax.random.fold_in(rng, t)},
                method=DasaPolicy.percept_step)
            state2, logit, _value, _aux = policy.apply(
                params, percept, valid, state,
                jnp.broadcast_to(t == 0, (n,)),
                deterministic=False, already_dropfeat=False,
                rngs={"dropout": jax.random.fold_in(rng, t + 1)},
                method=DasaPolicy.decode_from_percept)
            masked = jnp.where(sobs["logit_mask"], NEG_INF,
                               logit.astype(jnp.float32))
            a = jnp.where(is_sample, jnp.argmax(masked, axis=-1),
                          sobs["teacher"]).astype(jnp.int32)
            a_rec = jnp.minimum(a, sobs["cand_n"])
            node2, view2, stop = device_transition(arrays, node, view,
                                                   a, ended)
            return ((node2, view2, state2, ended | stop),
                    (a_rec, node, ended))

        _, (acts, nodes, ended_pre) = jax.lax.scan(
            step, (node, view, state, jnp.zeros((n,), bool)),
            jnp.arange(T, dtype=jnp.int32))
        return acts, nodes, ended_pre

    acts, nodes, ended_pre = run(agent.params)
    return (np.asarray(acts), np.asarray(nodes),
            np.asarray(ended_pre))


def test_streamed_episodes_match_standalone(world, connectivity_dir):
    """Every episode inside the streamed slot-time grid must take
    exactly the actions its standalone rollout takes — refills cannot
    leak decoder state, carried episodes must resume exactly, and the
    teacher half must walk the teacher path."""
    cfg = tiny_cfg()
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                         rng_seed=3)
    assert agent.use_stream_rollout()
    st = agent._stream_host()
    for _ in range(5):
        agent.zero_grad()
        # argmax feedback: trajectory comparison needs a draw-free
        # policy (the sampled draw differs by rng position by design)
        agent.device_rollout_stream(cfg.ml_weight, feedback="argmax",
                                    record=True)
        # no optim_step: frozen params so every window sees the same
        # policy as the standalone oracle

    eps = _collect_episodes(st.records)
    assert len(eps) >= 12, f"too few streamed episodes: {len(eps)}"
    B = cfg.batch_size
    n_done = sum(1 for e in eps.values() if e["done"])
    assert n_done >= 8

    uids = sorted(eps)
    rows = [st.staged[u] for u in uids]
    # slot half decides teacher vs argmax actions
    is_sample = np.array([eps[u]["slot"] >= B for u in uids])
    acts, nodes, _ = _batched_oracle(agent, rows, is_sample,
                                     cfg.max_action)

    for i, u in enumerate(uids):
        e = eps[u]
        L_e = len(e["actions"])
        assert L_e <= cfg.max_action
        np.testing.assert_array_equal(
            np.array(e["actions"]), acts[:L_e, i],
            err_msg=f"uid {u} slot {e['slot']} actions diverge")
        np.testing.assert_array_equal(
            np.array(e["nodes"]), nodes[:L_e, i],
            err_msg=f"uid {u} node path diverges")
        if e["done"]:
            # a finished streamed episode's last action is the STOP
            # slot (a_rec clips to cand_n exactly when action >= n)
            arrays = agent._dev_env.arrays()
            cand_n = int(np.asarray(arrays[1][e["nodes"][-1]]))
            assert e["actions"][-1] == cand_n


def test_stream_consumes_each_episode_exactly_once(world,
                                                   connectivity_dir):
    """Data exactness under pressure: a tiny pool forces admit clamps,
    host re-queues, and slot starvation — yet no episode may be taken
    twice or invented (uid uniqueness over every take event)."""
    cfg = tiny_cfg(stream_pool=3, stream_steps=7)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                         rng_seed=1)
    st = agent._stream_host()
    for _ in range(8):
        agent.zero_grad()
        agent.device_rollout_stream(cfg.ml_weight, feedback="argmax",
                                    record=True)
        agent.optim_step()

    take_uids = []
    for r in st.records:
        tk = r["rec_take"] & (r["rec_uid"] >= 0)
        take_uids.extend(r["rec_uid"][tk].tolist())
    assert len(take_uids) == len(set(take_uids)), "episode taken twice"
    assert set(take_uids) <= set(st.staged), "unknown uid consumed"
    assert len(take_uids) >= 20
    # the template placeholder must never be taken as an episode
    for r in st.records:
        assert not (r["rec_take"] & (r["rec_uid"] < 0)).any()
    # settle everything dispatched and reconcile the ledger: staged =
    # consumed + still-queued + still-pooled
    while st.inflight:
        agent._settle_stream_window(st)
    fifo_uids = {int(it["uid"]) for it in st.fifo}
    pooled = int(st.leftover_settled.sum())
    assert len(set(take_uids) & fifo_uids) == 0
    assert len(st.staged) == len(take_uids) + len(fifo_uids) + pooled


def test_stream_training_reduces_loss(world, connectivity_dir):
    cfg = tiny_cfg(ml_weight=1.0, stream_steps=8)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_stream_rollout()
    ml = []
    for _ in range(14):
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()
        ml.append(float(np.asarray(agent.logs["ml_loss"][-1])))
    assert np.isfinite(ml).all()
    assert np.mean(ml[-4:]) < np.mean(ml[:4]) * 0.9, ml


@pytest.mark.heavy
def test_stream_trains_as_well_per_agent_step(world, connectivity_dir):
    """CI-scale stream-vs-episodic quality A/B (VERDICT r3 weak #3):
    at MATCHED agent-step counts, streamed training's teacher-forcing
    loss must improve comparably to episodic training's — the per-
    agent-step learning signal survives the regime's different
    optimizer granularity.  (The full-scale SR/SPL A/B lives in
    scripts/stream_quality_ab.py / BENCH_NOTES.md.)"""
    data_dir, feature_db, tok = world
    budget = 2500  # agent-steps per regime

    def run(mode):
        cfg = tiny_cfg(ml_weight=1.0, rollout_mode=mode,
                       stream_steps=8)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
        mls = []
        while agent.env_steps_total() < budget:
            agent.zero_grad()
            agent.accumulate_gradient("sample")
            agent.optim_step()
            # teacher-forcing CE: the episodic pair logs (teacher pass,
            # sample pass) per iteration — the sample pass's entry is
            # sampled-action CE, which never converges; the streamed
            # window's single entry is already teacher-slot CE
            k = -2 if mode == "episodic" else -1
            mls.append(float(np.asarray(agent.logs["ml_loss"][k])))
        return np.mean(mls[:3]), np.mean(mls[-3:])

    e_first, e_last = run("episodic")
    s_first, s_last = run("stream")
    assert np.isfinite([e_first, e_last, s_first, s_last]).all()
    # both regimes learn...
    assert e_last < 0.8 * e_first, (e_first, e_last)
    assert s_last < 0.8 * s_first, (s_first, s_last)
    # ...and stream's per-agent-step progress is comparable: its final
    # teacher loss lands within 1.5x of episodic's at the same budget
    assert s_last < 1.5 * e_last, (s_last, e_last)


def test_lr_scale_rule_sqrt(world, connectivity_dir):
    """lr_scale_rule=sqrt derives k from the stream geometry (window
    scan steps / dataset mean episode length) and applies the sqrt
    large-batch rule to lr + 1/k to the schedule; episodic mode and
    rule=none are no-ops (BENCH_NOTES.md round-5 recipe)."""
    kw = dict(ml_weight=1.0, stream_steps=6, use_lr_scheduler=True,
              lr=1e-3, warm_steps=100, decay_start=400,
              decay_intervals=200)
    data_dir, feature_db, tok = world

    def build(**extra):
        cfg = tiny_cfg(**{**kw, **extra})
        env = make_env(world, cfg, connectivity_dir)
        return cfg, env, Seq2SeqAgent(cfg, env, feature_db,
                                      vocab_size=len(tok))

    cfg, env, agent = build(lr_scale_rule="sqrt")
    mean_len = np.mean([len(it["path"]) for it in env.data])
    k = max(1.0, 6 / mean_len)
    sched = agent.applied_lr_schedule
    assert np.isclose(sched["lr"], 1e-3 * np.sqrt(k))
    assert sched["warm_steps"] == int(np.ceil(100 / k))
    assert sched["decay_start"] == int(np.ceil(400 / k))
    assert sched["decay_intervals"] == max(1, round(200 / k))
    # the scaled agent still trains (finite loss through optim_step)
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(float(np.asarray(agent.losses[-1])))

    _, _, plain = build(lr_scale_rule="none")
    assert plain.applied_lr_schedule["lr"] == 1e-3
    _, _, epis = build(lr_scale_rule="sqrt", rollout_mode="episodic")
    assert epis.applied_lr_schedule["lr"] == 1e-3


@pytest.mark.heavy
def test_stream_unroll_is_pure_codegen(world, connectivity_dir):
    """stream_unroll is a throughput knob only: the unrolled window
    scan must produce the same losses and the same trained parameters
    as unroll=1 (same per-step ops, same rng folds — only XLA's loop
    codegen changes)."""
    def run(unroll):
        cfg = tiny_cfg(ml_weight=1.0, stream_steps=6,
                       stream_unroll=unroll)
        env = make_env(world, cfg, connectivity_dir)
        data_dir, feature_db, tok = world
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
        assert agent.use_stream_rollout()
        for _ in range(3):
            agent.zero_grad()
            agent.accumulate_gradient("sample")
            agent.optim_step()
        losses = [float(np.asarray(x)) for x in agent.logs["ml_loss"]]
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(agent.params["params"])]
        return losses, leaves

    l1, p1 = run(1)
    l3, p3 = run(3)
    np.testing.assert_allclose(l3, l1, rtol=1e-5, atol=1e-7)
    for a, b in zip(p1, p3):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7)


def test_stream_mesh_trajectories_and_exactness(world,
                                                connectivity_dir):
    """Data-parallel streaming (shard_map over a 4-device mesh,
    per-device slot+pool shards): per-episode trajectories must still
    equal standalone rollouts, every episode consumed exactly once
    across all shards, and the psum'd grads must be finite."""
    from dasa_tpu.parallel import make_mesh

    cfg = tiny_cfg(stream_pool=8)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                         rng_seed=7, mesh=mesh)
    assert agent.use_stream_rollout()
    st = agent._stream_host()
    geom = st.geom
    assert geom.D == 4 and geom.B == 1 and geom.W == 2
    for _ in range(5):
        agent.zero_grad()
        agent.device_rollout_stream(cfg.ml_weight, feedback="argmax",
                                    record=True)
        # no optim_step: frozen params for the standalone comparison

    eps = _collect_episodes(st.records)
    assert len(eps) >= 10, f"too few streamed episodes: {len(eps)}"
    uids = sorted(eps)
    rows = [st.staged[u] for u in uids]
    # device-major slot layout: global slot w = device d's slot j,
    # sample half iff j >= B (per-device)
    is_sample = np.array([eps[u]["slot"] % geom.W >= geom.B
                          for u in uids])
    acts, nodes, _ = _batched_oracle(agent, rows, is_sample,
                                     cfg.max_action)
    for i, u in enumerate(uids):
        e = eps[u]
        L_e = len(e["actions"])
        np.testing.assert_array_equal(
            np.array(e["actions"]), acts[:L_e, i],
            err_msg=f"uid {u} slot {e['slot']} actions diverge (mesh)")
        np.testing.assert_array_equal(
            np.array(e["nodes"]), nodes[:L_e, i],
            err_msg=f"uid {u} node path diverges (mesh)")

    take_uids = []
    for r in st.records:
        tk = r["rec_take"] & (r["rec_uid"] >= 0)
        take_uids.extend(r["rec_uid"][tk].tolist())
    assert len(take_uids) == len(set(take_uids))
    assert set(take_uids) <= set(st.staged)
    for g in jax.tree_util.tree_leaves(agent._grad_accum):
        assert np.isfinite(np.asarray(g)).all()
    agent.optim_step()  # replicated psum'd grads apply cleanly


@pytest.mark.parametrize("cfg_kw,aux_key", [
    (dict(pred_pm=True, pm_type="v1", pred_back=True), "pm_loss"),
    (dict(agent_type="advanced"), "pm_loss"),
    (dict(agent_type="mt"), "kl_loss"),
])
def test_stream_aux_heads_train(world, connectivity_dir, cfg_kw,
                                aux_key):
    """The stream program's auxiliary-loss branches (progress monitor,
    back head, advanced agent, MT soft-distance KL) run and produce
    finite losses/grads."""
    cfg = tiny_cfg(**cfg_kw)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_stream_rollout()
    for _ in range(2):
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()
        assert np.isfinite(float(np.asarray(agent.losses[-1])))
        assert np.isfinite(float(np.asarray(agent.logs[aux_key][-1])))


def test_stream_eval_matches_episodic_device_eval(world,
                                                  connectivity_dir):
    """Streamed evaluation must reproduce the episodic device eval's
    trajectories exactly — same split coverage, same per-instruction
    trajectory tuples (micro-steps included), under an untrained argmax
    policy that exercises maxAction truncation heavily."""
    data_dir, feature_db, tok = world

    def results_with(mode):
        cfg = tiny_cfg(rollout_mode=mode, max_action=4)
        env = make_env(world, cfg, connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                             rng_seed=11)
        out = {r["instr_id"]: r["trajectory"]
               for r in agent.test(feedback="argmax")}
        return out, agent

    episodic, _ = results_with("episodic")
    streamed, sagent = results_with("stream")
    assert sagent.use_stream_rollout()
    assert streamed.keys() == episodic.keys()
    for iid in episodic:
        assert streamed[iid] == episodic[iid], iid


def test_stream_env_swap_refreshes_device_tables(world,
                                                 connectivity_dir):
    """Regression: after an eval (or org/aug swap) on an env with a
    DIFFERENT scan set, the next streamed window must re-point
    self._dev_env at the current env's tables — staging against the
    stale tables KeyErrors (disjoint scans) or silently corrupts the
    rollout (overlapping scans)."""
    data_dir, feature_db, tok = world
    cfg = tiny_cfg()
    env_train = make_env(world, cfg, connectivity_dir)  # SCAN
    raw_val = load_datasets(["val_unseen"], data_dir)   # SCAN2
    items_val = expand_instructions(raw_val, tok, max_input=L)
    env_val = R2REnv(feature_db, items_val, batch_size=cfg.batch_size,
                     connectivity_dir=connectivity_dir,
                     max_candidates=cfg.max_candidates,
                     max_input=cfg.max_input)
    agent = Seq2SeqAgent(cfg, env_train, feature_db,
                         vocab_size=len(tok))
    assert agent.use_stream_rollout()
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    # eval on the other-scan env leaves _dev_env pointing at its tables
    agent.env = env_val
    agent.test(feedback="argmax")
    agent.env = env_train
    agent.zero_grad()
    agent.accumulate_gradient("sample")  # KeyError before the fix
    agent.optim_step()
    assert np.isfinite(float(np.asarray(agent.losses[-1])))


def test_stream_env_swap_keeps_separate_carries(world,
                                                connectivity_dir):
    """The trainer's org/aug alternation swaps self.env between
    accumulate calls; each env must keep its own stream carry and FIFO
    (the second call accumulates grads in-program)."""
    cfg = tiny_cfg()
    env_a = make_env(world, cfg, connectivity_dir)
    env_b = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env_a, feature_db, vocab_size=len(tok))
    for _ in range(2):
        agent.zero_grad()
        agent.env = env_a
        agent.accumulate_gradient("sample")
        agent.env = env_b
        agent.accumulate_gradient("sample")
        agent.optim_step()
    assert len(agent._stream_cache) == 2
    hosts = [v[1] for v in agent._stream_cache.values()]
    assert hosts[0] is not hosts[1]
    assert all(np.isfinite(float(np.asarray(l))) for l in agent.losses)


# ---------------------------------------------------------------------
# edge cases: starved windows, oversized pools, fuse_passes interaction
# ---------------------------------------------------------------------
def test_stream_starved_window_is_finite(world, connectivity_dir):
    """A window with ZERO fresh episodes, an empty pool, and all slots
    dead (the fully starved step) must produce finite loss/grads, zero
    env-steps, and an all-starved ledger — the loss masking's
    where-gradients are the usual NaN leak here."""
    import jax.numpy as jnp

    cfg = tiny_cfg(stream_steps=4, stream_pool=4)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_stream_rollout()
    st = agent._stream_host()
    geom = st.geom
    fresh = {f: jnp.stack([
        jnp.broadcast_to(jnp.asarray(agent._stream_template_row()[f]),
                         (geom.E,) + np.shape(
                             agent._stream_template_row()[f]))] * 2)
        for f in agent._stream_template_row()}
    f_n = jnp.zeros((1, 2), jnp.int32)
    fn = agent._stream_grad_fn("sample", False, False, geom)
    grads, logs, _carry = fn(
        agent.params, agent.tables, agent._dev_env.arrays(), st.carry,
        fresh, f_n, jax.random.PRNGKey(0),
        jnp.asarray(0.2), jnp.asarray(1.0), jnp.asarray(0.01))
    assert np.isfinite(float(np.asarray(logs["loss"])))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    assert int(np.asarray(logs["env_steps"])) == 0
    assert int(np.asarray(logs["admitted"]).sum()) == 0
    assert int(np.asarray(logs["consumed"]).sum()) == 0
    assert int(np.asarray(logs["leftover"]).sum()) == 0
    # every (step, slot) wanted a refill and none arrived
    assert int(np.asarray(logs["starved"])) == \
        geom.S * geom.W


def test_stream_pool_larger_than_dataset(world, connectivity_dir):
    """A pool shard bigger than the whole dataset (E > items): staging
    wraps the epoch, windows stay finite, and the take/fifo/leftover
    ledger still reconciles against everything staged."""
    # dataset = 16 paths x 3 instructions = 48 items; E = 160 > 48
    cfg = tiny_cfg(stream_steps=6, stream_pool=160)
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_stream_rollout()
    assert agent._stream_geom().E > env.size()
    for _ in range(4):
        agent.zero_grad()
        agent.device_rollout_stream(cfg.ml_weight, feedback="sample",
                                    record=True)
        agent.optim_step()
        assert np.isfinite(float(np.asarray(agent.losses[-1])))
    st = agent._stream_host()
    while st.inflight:  # settle everything dispatched
        agent._settle_stream_window(st)
    take_uids = []
    for r in st.records:
        tk = r["rec_take"] & (r["rec_uid"] >= 0)
        take_uids.extend(r["rec_uid"][tk].tolist())
    assert len(take_uids) == len(set(take_uids))  # exactly-once takes
    fifo_uids = {int(it["uid"]) for it in st.fifo}
    pooled = int(st.leftover_settled.sum())
    assert len(st.staged) == len(take_uids) + len(fifo_uids) + pooled


def test_stream_wins_over_fuse_passes(world, connectivity_dir):
    """rollout_mode=stream + fuse_passes=auto (the bench's exact config
    pair): accumulate_gradient must route to the streamed window, not
    the combined episodic program, and train to finite losses."""
    cfg = tiny_cfg(fuse_passes="auto")
    env = make_env(world, cfg, connectivity_dir)
    data_dir, feature_db, tok = world
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert agent.use_stream_rollout()
    assert agent.use_combined_rollout()  # both gates open...
    for _ in range(3):
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()
        assert np.isfinite(float(np.asarray(agent.losses[-1])))
    # ...but only stream programs were compiled/dispatched
    kinds = {k[0] for k in agent._jit_cache if isinstance(k, tuple)}
    assert "devstream" in kinds
    assert "devcomb" not in kinds
