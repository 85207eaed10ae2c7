"""Agent integration tests on tiny synthetic data over real graphs:
teacher-feedback acting, IL training convergence, argmax eval, the
IL+A2C mixed objective, and checkpoint save/load."""

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
from dasa_tpu.train import Evaluation
from dasa_tpu.utils import Tokenizer, build_vocab

SCAN = "17DRP5sb8fy"
SCAN2 = "2t7WUuJeko7"
DIM = 24
L = 24


def tiny_cfg(**kw):
    base = dict(
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=DIM, max_input=L, max_candidates=16, max_action=8,
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
    depth_db = FeatureDB.synthetic([SCAN, SCAN2], connectivity_dir,
                                   dim=DIM, salt=7)
    train_raw = load_datasets(["train"], data_dir)
    vocab = build_vocab(train_raw, min_count=1)
    tok = Tokenizer(vocab, encoding_length=L)
    return data_dir, feature_db, depth_db, tok


def make_env(world, cfg, split, connectivity_dir):
    data_dir, feature_db, depth_db, tok = world
    raw = load_datasets([split], data_dir)
    items = expand_instructions(raw, tok, max_input=cfg.max_input)
    env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                 connectivity_dir=connectivity_dir,
                 max_candidates=cfg.max_candidates,
                 max_input=cfg.max_input, name=split, depth_db=depth_db)
    return env, raw


def test_teacher_rollout_and_results(world, connectivity_dir):
    cfg = tiny_cfg()
    data_dir, feature_db, depth_db, tok = world
    env, raw = make_env(world, cfg, "val_seen", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    trajs = agent.rollout(train_ml=None, train_rl=False,
                          feedback="teacher")
    assert len(trajs) == cfg.batch_size
    # teacher feedback follows the shortest path => perfect score
    ev = Evaluation(raw, connectivity_dir, splits=["val_seen"])
    summary, _ = ev.score(list(agent.results.values()), allow_partial=True)
    assert summary["success_rate"] == 1.0


def test_argmax_eval_runs(world, connectivity_dir):
    cfg = tiny_cfg()
    data_dir, feature_db, depth_db, tok = world
    env, raw = make_env(world, cfg, "val_seen", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    results = agent.test(feedback="argmax")
    assert len(results) == env.size()
    ev = Evaluation(raw, connectivity_dir, splits=["val_seen"])
    summary, _ = ev.score(results)
    assert 0.0 <= summary["success_rate"] <= 1.0


def test_il_training_reduces_loss(world, connectivity_dir):
    cfg = tiny_cfg()
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    losses = []
    for _ in range(12):
        agent.zero_grad()
        agent.rollout(train_ml=1.0, train_rl=False, feedback="teacher")
        agent.optim_step()
        losses.append(agent.losses[-1])
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9, losses


def test_mixed_il_rl_training_step(world, connectivity_dir):
    cfg = tiny_cfg()
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    assert agent._grad_accum is not None
    agent.optim_step()
    assert "rl_loss" in agent.logs and "critic_loss" in agent.logs
    assert np.isfinite(agent.logs["rl_loss"]).all()


def test_dg_policy_full_config_rollout(world, connectivity_dir):
    """Full DASA wiring: Dic encoder + vision, AdaIN channel, shift
    attention, consistent env-drop, depth drop."""
    cfg = tiny_cfg(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", max_action=4, batch_size=2)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    agent.zero_grad()
    agent.rollout(train_ml=0.4, train_rl=False, feedback="teacher")
    agent.rollout(train_ml=None, train_rl=True, feedback="sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()


def test_save_load_roundtrip(world, connectivity_dir, tmp_path):
    cfg = tiny_cfg(load_optim=True)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    path = str(tmp_path / "ckpt.pkl")
    agent.save(3, path)
    agent2 = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                          rng_seed=99)
    epoch = agent2.load(path)
    assert epoch == 3
    import jax

    a = jax.tree_util.tree_leaves(agent.params)
    b = jax.tree_util.tree_leaves(agent2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_tolerates_component_mismatch(world, connectivity_dir,
                                           tmp_path, capsys):
    """A checkpoint from a plain agent loads into a pred_pm agent: every
    matching leaf restores exactly, the pm head keeps its init, and a
    NOTICE is printed (reference recover_state, agent_dg.py:1489-1510)."""
    data_dir, feature_db, depth_db, tok = world
    base = dict(encoder_type="Dic", include_vision=True)
    env, _ = make_env(world, tiny_cfg(**base), "train", connectivity_dir)
    donor = Seq2SeqAgent(tiny_cfg(**base), env, feature_db,
                         vocab_size=len(tok))
    path = str(tmp_path / "ckpt.msgpack")
    donor.save(5, path)

    cfg2 = tiny_cfg(**base, pred_pm=True)
    target = Seq2SeqAgent(cfg2, env, feature_db, vocab_size=len(tok),
                          rng_seed=7)
    init_pm = np.asarray(
        target.params["params"]["decoder"]["pm_critic"]["kernel"]).copy()
    assert target.load(path) == 5
    out = capsys.readouterr().out
    assert "NOTICE" in out
    # matching leaves restored exactly
    np.testing.assert_array_equal(
        np.asarray(target.params["params"]["decoder"]["embedding"]
                   ["kernel"]),
        np.asarray(donor.params["params"]["decoder"]["embedding"]
                   ["kernel"]))
    # pm head kept its init
    np.testing.assert_array_equal(
        np.asarray(target.params["params"]["decoder"]["pm_critic"]
                   ["kernel"]), init_pm)


def test_act_replay_rng_equivalence(world, connectivity_dir):
    """The replay scan must reproduce the act phase's per-step forward
    exactly: same fold_in(base_rng, t) rng derivation inside lax.scan as
    in the per-step jitted calls (the core invariant that makes replay
    training mathematically identical to the acted rollout)."""
    import jax
    import jax.numpy as jnp

    from dasa_tpu.models import DasaPolicy, DecoderState
    from dasa_tpu.agents.seq2seq import make_step_inputs

    cfg = tiny_cfg(consistent_drop=True, max_action=4, batch_size=2,
                   encoder_type="Dic", include_vision=True,
                   adain_type="channel", ab_type="a", a_type="sigmoid")
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    obs = env.reset()
    base_rng = jax.random.PRNGKey(42)
    env_noise = agent._noise_fn()(base_rng)
    instr = jnp.asarray(obs.instr)
    valid = jnp.asarray(~obs.pad_mask)
    seq_len = jnp.asarray(obs.seq_len)
    cached = agent._encode_fn(True)(agent.params, instr, valid, seq_len,
                                    base_rng)
    sobs_list = []
    ended = np.zeros(2, bool)
    for t in range(3):
        sobs_list.append(agent._to_sobs(obs, ended, None, t == 0))
        a = np.where(obs.teacher < obs.cand_n, obs.teacher, -1)
        obs = env.step(a)

    # per-step (act-style) forwards: split applies with the percept=0 /
    # decode=1 rng streams exactly as the agent's _act_fn issues them
    def act_one(sobs_dev, state, t):
        inputs = make_step_inputs(cfg, agent.tables, sobs_dev)
        step_rng = jax.random.fold_in(base_rng, t)
        percept = agent.policy.apply(
            agent.params, cached, valid, seq_len, inputs,
            deterministic=False, is_test=False, env_noise=env_noise,
            rngs={"dropout": jax.random.fold_in(step_rng, 0)},
            method=DasaPolicy.percept_step)
        return agent.policy.apply(
            agent.params, percept, valid, state,
            sobs_dev["is_first"], deterministic=False,
            already_dropfeat=True,
            rngs={"dropout": jax.random.fold_in(step_rng, 1)},
            method=DasaPolicy.decode_from_percept)

    dec_h = cfg.d_hidden_size
    state = DecoderState(*(jnp.zeros((2, dec_h)),) * 3)
    act_states = []
    for t, sobs in enumerate(sobs_list):
        sobs_dev = {k: jnp.asarray(v) for k, v in sobs.items()}
        state, logit, value, _ = act_one(sobs_dev, state, t)
        act_states.append((np.asarray(state.h), np.asarray(logit)))

    # replay-style: vmapped percepts over T + decode scan, exactly as
    # the agent's loss program computes them
    stacked = {k: jnp.asarray(np.stack([s[k] for s in sobs_list]))
               for k in sobs_list[0]}

    def percept_one(sobs_t, t):
        inputs = make_step_inputs(cfg, agent.tables, sobs_t)
        step_rng = jax.random.fold_in(base_rng, t)
        return agent.policy.apply(
            agent.params, cached, valid, seq_len, inputs,
            deterministic=False, is_test=False, env_noise=env_noise,
            rngs={"dropout": jax.random.fold_in(step_rng, 0)},
            method=DasaPolicy.percept_step)

    percepts = jax.vmap(percept_one)(stacked,
                                     jnp.arange(3, dtype=jnp.int32))

    def step(carry, xs):
        st, t = carry
        percept_t, sobs = xs
        d_rng = jax.random.fold_in(jax.random.fold_in(base_rng, t), 1)
        new_state, logit, value, _ = agent.policy.apply(
            agent.params, percept_t, valid, st,
            sobs["is_first"], deterministic=False,
            already_dropfeat=True, rngs={"dropout": d_rng},
            method=DasaPolicy.decode_from_percept)
        return (new_state, t + 1), (new_state.h, logit)

    (_, _), (hs, logits) = jax.lax.scan(
        step, (DecoderState(*(jnp.zeros((2, dec_h)),) * 3),
               jnp.asarray(0, jnp.int32)), (percepts, stacked))
    for t in range(3):
        np.testing.assert_allclose(np.asarray(hs[t]), act_states[t][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(logits[t]),
                                   act_states[t][1], rtol=1e-4,
                                   atol=1e-5)


def test_double_agent_rollout_and_training(world, connectivity_dir):
    """agent_double wiring: dual RGB+depth decoders with summed logits
    run through the full act/replay machinery."""
    cfg = tiny_cfg(encoder_type="Dic", include_vision=True,
                   agent_type="double", max_action=4, batch_size=2)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    agent.zero_grad()
    agent.rollout(train_ml=1.0, train_rl=False, feedback="teacher")
    agent.rollout(train_ml=None, train_rl=True, feedback="sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()
    results = agent.test(feedback="argmax")
    assert len(results) == env.size()


def test_paired_replay_matches_separate(world, connectivity_dir):
    """defer_pairs=True fuses the two replay grads into one vmapped
    program; the accumulated gradients must match the separate-dispatch
    path exactly (same rollouts via the same rng stream)."""
    import jax

    cfg = tiny_cfg(max_action=4, batch_size=2)
    data_dir, feature_db, depth_db, tok = world

    def grads_with(defer):
        env, _ = make_env(world, cfg, "train", connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
        agent.zero_grad()
        agent.accumulate_gradient("sample", defer_pairs=defer)
        agent.flush_replays()
        return jax.tree_util.tree_leaves(agent._grad_accum)

    g_sep = grads_with(False)
    g_pair = grads_with(True)
    for a, b in zip(g_sep, g_pair):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("pm_type", ["att", "plain_att_hid"])
def test_progress_monitor_head(world, connectivity_dir, pm_type):
    """pred_pm: the decoder grows a sigmoid progress head fed by the
    (resampled) instruction attention (model.py:449-458, 533-553); its
    MSE vs the episode-start progress joins the ML loss
    (agent_dg.py:683, 864-866, 1015-1017) and training reduces it."""
    cfg = tiny_cfg(encoder_type="Dic", include_vision=True, pred_pm=True,
                   pm_type=pm_type, max_action=4, batch_size=2, lr=3e-3)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    assert "pm_critic" in agent.params["params"]["decoder"]
    pm_losses = []
    for _ in range(8):
        agent.zero_grad()
        agent.rollout(train_ml=1.0, train_rl=False, feedback="teacher")
        agent.optim_step()
        pm_losses.append(float(agent.logs["pm_loss"][-1]))
    assert np.isfinite(pm_losses).all()
    # episode-start progress is ~0; the sigmoid head starts near 0.5 and
    # must move toward the target
    assert pm_losses[-1] < pm_losses[0]


@pytest.mark.parametrize("encoder_type", [
    "BEncoder", pytest.param("CEncoder", marks=pytest.mark.heavy)])
def test_bc_encoder_types(world, connectivity_dir, encoder_type):
    """--encoderType BEncoder/CEncoder (model.py:88-247): text-only BERT
    embeddings (C: projected to wemb) feed the plain LSTM path; training
    step + argmax eval run end-to-end."""
    cfg = tiny_cfg(encoder_type=encoder_type, max_action=4, batch_size=2,
                   update_bert=False)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    enc = agent.params["params"]["encoder"]
    assert "bert" in enc
    assert ("linear_in" in enc) == (encoder_type == "CEncoder")
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()
    results = agent.test(feedback="argmax")
    assert len(results) == env.size()


def test_bencoder_n_layer_concat(world, connectivity_dir):
    """--d_bert_n_layers > 1 concatenates the last n text-BERT layer
    outputs before the top LSTM (the legacy zoo's bert_n_layers knob,
    r2rmodel.py:772-773 / 754: LSTM input sized hidden*n).  The LSTM
    input width must reflect the concat, and the whole path trains."""
    cfg = tiny_cfg(encoder_type="BEncoder", max_action=4, batch_size=2,
                   update_bert=False, d_la_layers=2, d_bert_n_layers=2)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    import jax

    lstm = agent.params["params"]["encoder"]["lstm"]
    # some LSTM weight must take the 768*2-wide concat as input
    widths = {v.shape[0] for v in jax.tree_util.tree_leaves(lstm)
              if hasattr(v, "shape") and v.ndim == 2}
    assert (2 * 768) in widths, sorted(widths)
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()


@pytest.mark.parametrize("cfg_kw", [
    {},  # plain EncoderLSTM path
    # flagship DASA config: Dic encoder + AdaIN channel + consistent drop
    pytest.param(
        dict(encoder_type="Dic", include_vision=True,
             adain_type="channel", ab_type="a", a_type="sigmoid",
             consistent_drop=True),
        marks=pytest.mark.heavy),
])
def test_data_parallel_training_matches_single_device(world,
                                                      connectivity_dir,
                                                      cfg_kw):
    """Listener training sharded over a 4-device data mesh must follow
    the single-device loss trajectory at matched global batch: values
    are identical programs under GSPMD, only the partitioning differs
    (replaces tasks/R2R/parallel.py:24-119 semantics)."""
    import jax

    from dasa_tpu.parallel import make_mesh

    cfg = tiny_cfg(batch_size=4, max_action=4, **cfg_kw)
    data_dir, feature_db, depth_db, tok = world

    def run(mesh):
        env, _ = make_env(world, cfg, "train", connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok),
                             mesh=mesh)
        losses = []
        for _ in range(3):
            agent.zero_grad()
            agent.accumulate_gradient("sample")
            agent.optim_step()
            losses.append(float(agent.losses[-1]))
        return losses

    single = run(None)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("agent_type", [
    "advanced", "kvmem", "new",
    pytest.param("mutan", marks=pytest.mark.heavy),
    pytest.param("mcatt", marks=pytest.mark.heavy),
    pytest.param("mt", marks=pytest.mark.heavy)])
def test_variant_agents_train_and_eval(world, connectivity_dir,
                                       agent_type):
    """Each reference --agent_type (train.py:24-46) runs end-to-end:
    mixed IL+RL accumulate-gradient step, then argmax eval covering the
    split.  Decoders: model.py:578-931 (advanced/kvmem/new/mutan),
    1505-1591 (mcatt, with the McattEncoder), 1609-1707 (mt)."""
    kw = dict(encoder_type="Dic", include_vision=True, max_action=4,
              batch_size=2, agent_type=agent_type)
    if agent_type == "mcatt":
        kw.update(mcan_hidden_size=32, mcan_heads=4, mcan_layers=1,
                  mcan_flat_mlp_size=16)
    cfg = tiny_cfg(**kw)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()
    if agent_type == "advanced":
        assert np.isfinite(agent.logs["pm_loss"]).all()
    if agent_type == "mt":
        # the soft-distance KL term (agent_mt.py:712-718) is live
        kl = np.asarray(agent.logs["kl_loss"], np.float64)
        assert kl.size and np.isfinite(kl).all() and (kl > 0).any()
    results = agent.test(feedback="argmax")
    assert len(results) == env.size()


@pytest.mark.parametrize("encoder_type", [
    pytest.param("Transformer", marks=pytest.mark.heavy), "Gpt",
    pytest.param("BertImg", marks=pytest.mark.heavy),
    pytest.param("BertAdd", marks=pytest.mark.heavy),
    pytest.param("BertMix", marks=pytest.mark.heavy)])
def test_legacy_encoder_types(world, connectivity_dir, encoder_type):
    """Legacy encoder zoo (models/legacy.py; reference r2rmodel.py
    352-456, 559-634, 999-1124, 1172-1331, 1755-1904): each
    --encoderType trains a mixed IL+RL step and covers the split under
    argmax eval.  Transformer/Gpt run the plain once-per-episode path;
    BertImg/BertAdd run the cross-modal per-step path with a joint
    [vision; text] ctx; BertMix fuses the same way but strips the image
    rows so ctx is text-only."""
    kw = dict(encoder_type=encoder_type, max_action=4, batch_size=2)
    if encoder_type in ("Transformer", "Gpt"):
        kw.update(legacy_width=16, legacy_heads=2, legacy_layers=1)
    else:
        kw.update(include_vision=True)
    cfg = tiny_cfg(**kw)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()
    results = agent.test(feedback="argmax")
    assert len(results) == env.size()


def test_gpt_encoder_is_causal(world, connectivity_dir):
    """The Gpt variant's attention must be causal: a token's encoding
    cannot change when a LATER token changes (r2rmodel.py:559-634 wraps
    OpenAI GPT, whose masking is triangular)."""
    import jax

    from dasa_tpu.models.legacy import TransformerTextEncoder

    import jax.numpy as jnp

    # unidirectional top LSTM so the whole encoder is left-to-right
    enc = TransformerTextEncoder(
        vocab_size=50, width=16, heads=2, n_layers=2, hidden_size=8,
        dec_hidden_size=16, dropout_ratio=0.0, causal=True,
        bidirectional=False)
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 50, size=(2, 10))
    valid = np.ones((2, 10), bool)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                      jnp.asarray(valid))
    ctx1, _, _ = enc.apply(params, jnp.asarray(tokens),
                           jnp.asarray(valid))
    mutated = tokens.copy()
    mutated[:, -1] = (mutated[:, -1] % 49) + 1  # change only last token
    ctx2, _, _ = enc.apply(params, jnp.asarray(mutated),
                           jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(ctx1[:, :-1]),
                               np.asarray(ctx2[:, :-1]),
                               rtol=1e-5, atol=1e-6)
    # and the non-causal variant must NOT be prefix-invariant
    enc_nc = TransformerTextEncoder(
        vocab_size=50, width=16, heads=2, n_layers=2, hidden_size=8,
        dec_hidden_size=16, dropout_ratio=0.0, causal=False,
        bidirectional=False)
    params_nc = enc_nc.init(jax.random.PRNGKey(0), jnp.asarray(tokens),
                            jnp.asarray(valid))
    c1, _, _ = enc_nc.apply(params_nc, jnp.asarray(tokens),
                            jnp.asarray(valid))
    c2, _, _ = enc_nc.apply(params_nc, jnp.asarray(mutated),
                            jnp.asarray(valid))
    assert np.abs(np.asarray(c1[:, :-1]) - np.asarray(c2[:, :-1])).max() \
        > 1e-6


def test_eval_ignores_env_drop(world, connectivity_dir):
    """At eval the reference's env-drop mask is identity (noise comes
    from an nn.Dropout in eval mode, agent_dg.py:657/677), so argmax
    trajectories must not depend on the consistent_drop flag."""
    data_dir, feature_db, depth_db, tok = world

    def results_with(consistent):
        cfg = tiny_cfg(encoder_type="Dic", include_vision=True,
                       adain_type="channel", ab_type="a",
                       a_type="sigmoid", consistent_drop=consistent,
                       max_action=4, batch_size=2)
        env, _ = make_env(world, cfg, "train", connectivity_dir)
        agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                             vocab_size=len(tok), rng_seed=7)
        return {r["instr_id"]: r["trajectory"]
                for r in agent.test(feedback="argmax")}

    a, b = results_with(True), results_with(False)
    assert a == b


def test_dyrelu_decoder_agent(world, connectivity_dir):
    """agent_dyrelu wiring: language-conditioned DyReLU on candidate
    features through a training step."""
    cfg = tiny_cfg(encoder_type="Dic", include_vision=True,
                   decoder_type="dyrelu", max_action=4, batch_size=2)
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert "dyrelu1" in agent.params["params"]["decoder"]
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()


def test_rbg_prng_trains_and_restores_default(world, connectivity_dir):
    """prng_impl='rbg' (hardware RNG for dropout masks — the TPU bench
    default, 1667 -> 1908 steps/s) trains with finite losses; creating
    a threefry agent afterwards restores the process-global default."""
    import jax

    cfg = tiny_cfg(prng_impl="rbg")
    data_dir, feature_db, depth_db, tok = world
    env, _ = make_env(world, cfg, "train", connectivity_dir)
    agent = Seq2SeqAgent(cfg, env, feature_db, vocab_size=len(tok))
    assert jax.config.jax_default_prng_impl == "rbg"
    agent.zero_grad()
    agent.accumulate_gradient("sample")
    agent.optim_step()
    assert np.isfinite(agent.losses).all()

    env2, _ = make_env(world, tiny_cfg(), "train", connectivity_dir)
    Seq2SeqAgent(tiny_cfg(), env2, feature_db, vocab_size=len(tok))
    assert jax.config.jax_default_prng_impl == "threefry2x32"
