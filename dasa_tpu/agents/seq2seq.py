"""The navigation agent: host-driven acting, scanned replay training.

TPU-native restructuring of the reference Seq2SeqAgent
(r2r_src/agent_dg.py:102-1510).  The reference interleaves model forwards
with env steps and keeps one growing autograd graph across the episode;
under XLA we split the rollout into two phases:

1. **Act** — a host loop calls one jitted `policy_step` per env step
   (actions only, no grads), stepping the graph simulator in between and
   recording the small per-step observation arrays.
2. **Replay** — one jitted program re-runs the whole episode as a
   `lax.scan` over the recorded observations (teacher-forcing the actions
   actually taken), computes the exact IL + A2C losses of the reference
   (vl_rollout, agent_dg.py:633-1033), and backprops through all steps at
   once.

Replay is bit-equivalent to acting because every stochastic choice
(dropout noise, the shared env-drop mask, gumbel noise) is derived from
`fold_in(base_rng, step)` identically in both phases.

Feature tables live device-resident; per-step host->device traffic is a
few KB of int32/float32 per batch.
"""

from __future__ import annotations

import functools
import os
import pickle
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from dasa_tpu.config import Config
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import Obs, R2REnv
from dasa_tpu.models import DasaPolicy, DecoderState, StepInputs
from dasa_tpu.models.policy import decoder_state_width
from dasa_tpu.models.featurize import (
    angle_feature,
    assemble_candidates,
    assemble_pano,
)
from dasa_tpu.models.layers import NEG_INF
from dasa_tpu.agents.stream import StreamMixin
from dasa_tpu.train.optim import build_optimizer
from dasa_tpu.utils.angles import (
    all_point_angle_feature,
    view_rel_weight_table,
)

NOISE_SALT = 1 << 20
INIT_SALT = (1 << 20) + 1


def _dtype_of(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def make_step_inputs(cfg: Config, tables, sobs) -> StepInputs:
    """Gather pano/candidate features on device from resident tables."""
    feat_table, dfeat_table, angle_table = tables
    f_t = assemble_pano(feat_table, angle_table, sobs["feat_row"],
                        sobs["view_index"])
    cand = assemble_candidates(
        feat_table, sobs["feat_row"], sobs["cand_point_id"],
        sobs["cand_heading"], sobs["cand_elevation"], sobs["cand_n"],
        cfg.angle_feat_size)
    if dfeat_table is not None:
        d_t = assemble_pano(dfeat_table, angle_table, sobs["feat_row"],
                            sobs["view_index"])
        cand_d = assemble_candidates(
            dfeat_table, sobs["feat_row"], sobs["cand_point_id"],
            sobs["cand_heading"], sobs["cand_elevation"], sobs["cand_n"],
            cfg.angle_feat_size)
    else:
        d_t, cand_d = f_t, cand
    act_feat = angle_feature(sobs["heading"], sobs["elevation"],
                             cfg.angle_feat_size)
    # view-token index per candidate slot (STOP slot -> the learned stop
    # token at index `views`); only the MT decoder consumes this, XLA
    # DCEs it elsewhere
    slots = jnp.arange(sobs["cand_point_id"].shape[-1], dtype=jnp.int32)
    cand_idx = jnp.where(slots >= sobs["cand_n"][..., None],
                         jnp.int32(cfg.views),
                         jnp.clip(sobs["cand_point_id"], 0,
                                  cfg.views - 1)).astype(jnp.int32)
    return StepInputs(act_feat, f_t, d_t, cand, cand_d,
                      sobs["logit_mask"], cand_idx)


def _entropy(logp, p):
    return -jnp.sum(jnp.where(p > 0, p * logp, 0.0), axis=-1)


def mt_kl_rows(logp, teacher, cand_point_id, cand_n, has_row):
    """Per-row soft-distance KL for the MT agent (agent_mt.py:712-718).

    The reference builds a per-step target distribution over the REAL
    candidate slots by softmaxing angular-proximity weights between each
    candidate's view index and the teacher candidate's view index
    (get_distance_weight, utils.py:703-713; padding masked to -1e5), and
    adds KL(policy || target) as `F.kl_div(logp, target, 'mean')` over
    the flattened valid entries: rows with a real teacher move
    (`has_action` — not ended, teacher is not STOP), slots < cand_n
    (the stop slot and padding are in the policy softmax's denominator
    but excluded from the KL elements, matching candidate_idx == -1).

    Returns (kl_row, cnt_row): each row's summed elementwise
    target * (log target - logp) over its real candidate slots, and the
    count of those elements — the caller divides sum by count to get the
    reference's per-step 'mean' reduction at its batch structure.
    """
    k = logp.shape[-1]
    W = jnp.asarray(view_rel_weight_table())               # (36, 36)
    t_slot = jnp.clip(teacher, 0, k - 1)                   # has_row guards
    t_view = jnp.take_along_axis(
        jnp.clip(cand_point_id, 0, W.shape[0] - 1),
        t_slot[:, None], axis=1)[:, 0]
    c_view = jnp.clip(cand_point_id, 0, W.shape[0] - 1)
    w = W[t_view[:, None], c_view]                         # (B, K)
    slots = jnp.arange(k, dtype=jnp.int32)[None, :]
    real_c = slots < cand_n[:, None]
    tgt = jax.nn.softmax(jnp.where(real_c, w, -1e5), axis=-1)
    valid = real_c & has_row[:, None]
    elem = jnp.where(
        valid,
        jax.scipy.special.xlogy(tgt, tgt) - tgt * logp.astype(jnp.float32),
        0.0)
    return elem.sum(-1), valid.sum(-1).astype(jnp.float32)


class Seq2SeqAgent(StreamMixin):
    """Listener agent (plain LSTM path and DASA dg path)."""

    def __init__(self, cfg: Config, env: Optional[R2REnv],
                 feature_db: FeatureDB,
                 depth_db: Optional[FeatureDB] = None,
                 vocab_size: int = 0, results_path: Optional[str] = None,
                 rng_seed: int = 0, mesh=None):
        self.cfg = cfg
        impl = {"threefry": "threefry2x32"}.get(cfg.prng_impl,
                                                cfg.prng_impl)
        if jax.config.jax_default_prng_impl != impl:
            # process-global by JAX design; must land before any key in
            # this agent is created (raw uint32 keys are reinterpreted
            # under the default impl, so mixing impls corrupts streams).
            # Set unconditionally so a later threefry agent undoes an
            # earlier rbg agent's global switch.
            jax.config.update("jax_default_prng_impl", impl)
        self.env = env
        self.mesh = mesh  # data-parallel jax.sharding.Mesh (or None)
        self.results_path = results_path
        self.episode_len = cfg.max_action
        self.feedback = cfg.feedback
        dtype = _dtype_of(cfg.compute_dtype)
        if jax.default_backend() == "cpu":
            dtype = jnp.float32
        self.dtype = dtype

        self.policy = DasaPolicy(cfg, vocab_size=vocab_size, dtype=dtype)
        # the VMEM-resident LSTM token scan (ops/lstm.py) runs only
        # inside the fused device programs (single forward per action —
        # no act/replay numeric-consistency constraint) and only on TPU
        # (the interpreter would crawl on CPU)
        self._lstm_pallas = (cfg.use_pallas != "never"
                             and jax.default_backend() == "tpu")
        self._init_params(rng_seed)
        if cfg.pretrain_model_name:
            # encoder init from the pretraining checkpoint — the
            # reference's `encoder.bert = premodel.bert` at agent
            # construction (agent_dg.py:135-188; README.md:94 passes
            # --pretrain_model_name in the headline command).  Accepts
            # HF torch dirs / .bin (all four r2rpretrain_class.py
            # families) and our Pretrainer checkpoints.
            from dasa_tpu.utils.pretrain_load import (
                load_pretrained_encoder,
            )

            self.params, missed = load_pretrained_encoder(
                self.params, cfg.pretrain_model_name)
            note = (f"; {len(missed)} unmatched leaves, e.g. "
                    f"{missed[:3]}" if missed else "")
            print(f"Initialized encoder from pretrain checkpoint "
                  f"{cfg.pretrain_model_name}{note}", flush=True)
        opt_cfg = cfg
        if cfg.lr_scale_rule == "sqrt" and cfg.rollout_mode == "stream":
            # sqrt large-batch rule for the stream regime's coarser
            # optimizer updates (one update per W*S agent-steps vs the
            # episodic pair's 2B*mean_len — agent_dg.py:1347-1384):
            # lr *= sqrt(k), schedule iterations /= k so warmup/decay
            # stay aligned in agent-steps.  Validated at the headline
            # config: closes stream-auto's val_seen deficit vs
            # episodic training (BENCH_NOTES.md round-5).
            s_len = cfg.stream_steps or cfg.max_action
            k = max(1.0, s_len / self._stream_mean_len())
            opt_cfg = cfg.replace(
                lr=cfg.lr * float(np.sqrt(k)),
                warm_steps=int(np.ceil(cfg.warm_steps / k)),
                decay_start=int(np.ceil(cfg.decay_start / k)),
                decay_intervals=max(1, round(cfg.decay_intervals / k)))
            print(f"lr_scale_rule=sqrt: k={k:.2f} lr={opt_cfg.lr:.3g} "
                  f"warm={opt_cfg.warm_steps} "
                  f"decay={opt_cfg.decay_start}/"
                  f"{opt_cfg.decay_intervals}", flush=True)
        self.applied_lr_schedule = {
            "lr": opt_cfg.lr, "warm_steps": opt_cfg.warm_steps,
            "decay_start": opt_cfg.decay_start,
            "decay_intervals": opt_cfg.decay_intervals}
        self.tx = build_optimizer(opt_cfg, self.params["params"])
        self.opt_state = self.tx.init(self.params["params"])

        # device-resident tables
        self.feat_table = jnp.asarray(feature_db.values, dtype)
        self.dfeat_table = (jnp.asarray(depth_db.values, dtype)
                            if depth_db is not None else None)
        self.angle_table = jnp.asarray(
            all_point_angle_feature(cfg.angle_feat_size), dtype)

        if mesh is not None:
            # replicate weights/tables once; episode batches are sharded
            # over the mesh's data axis at dispatch and GSPMD inserts the
            # gradient all-reduce inside the replay backward (replacing
            # the reference's DataParallel/DDP — tasks/R2R/parallel.py)
            from dasa_tpu.parallel import replicate

            self.params = replicate(self.params, mesh)
            self.opt_state = replicate(self.opt_state, mesh)
            self.feat_table = replicate(self.feat_table, mesh)
            if self.dfeat_table is not None:
                self.dfeat_table = replicate(self.dfeat_table, mesh)
            self.angle_table = replicate(self.angle_table, mesh)

        self._base_rng = jax.random.PRNGKey(cfg.seed + rng_seed)
        self._rollout_counter = 0
        self._env_steps_log: List = []   # device-rollout step counts (lazy)
        self._dev_env = None
        self.losses: List[float] = []
        self.logs = defaultdict(list)
        self.results: Dict[str, dict] = {}
        self._grad_accum = None
        self._pending_replays: List[dict] = []
        self._jit_cache: Dict = {}
        self.iter_count = 0
        self.total_env_steps = 0  # (episode, step) pairs processed

    # ------------------------------------------------------------------
    def _init_params(self, rng_seed: int):
        cfg = self.cfg
        b, k, L = 2, cfg.max_candidates, cfg.max_input
        F = cfg.feature_all_size
        dummy = StepInputs(
            action_feat=jnp.zeros((b, cfg.angle_feat_size), self.dtype),
            f_t=jnp.zeros((b, cfg.views, F), self.dtype),
            d_t=jnp.zeros((b, cfg.views, F), self.dtype),
            cand_feat=jnp.zeros((b, k, F), self.dtype),
            cand_dfeat=jnp.zeros((b, k, F), self.dtype),
            cand_mask=jnp.zeros((b, k), bool),
            cand_idx=jnp.zeros((b, k), jnp.int32),
        )
        instr = jnp.zeros((b, L), jnp.int32)
        valid = jnp.ones((b, L), bool)
        seq_len = jnp.full((b,), L, jnp.int32)
        self.params = self.policy.init(
            jax.random.PRNGKey(rng_seed), instr, valid, seq_len, dummy)

    @property
    def tables(self):
        return (self.feat_table, self.dfeat_table, self.angle_table)

    # ------------------------------------------------------------------
    # device placement (data-parallel sharding when a mesh is set)
    # ------------------------------------------------------------------
    def _put_batch(self, tree, axis: int = 0):
        """Move host arrays to device; with a mesh, shard dim `axis`
        (the episode-batch dim) over the data axis."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        from dasa_tpu.parallel import shard_batch

        return shard_batch(tree, self.mesh, axis=axis)

    def _put_replicated(self, tree):
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        from dasa_tpu.parallel import replicate

        return replicate(jax.tree_util.tree_map(jnp.asarray, tree),
                         self.mesh)

    def _put_replay_args(self, args):
        """Shard one replay's argument tuple: (B, ...) leaves over axis
        0, (T, B, ...) stacks over axis 1, rng/noise/weights replicated."""
        (instr, valid, seq_len, stacked, final_sobs, rewards, rl_masks,
         ended, pm_target, base_rng, env_noise, mlw, rlw, entw) = args
        put, rep = self._put_batch, self._put_replicated
        stack = lambda t: self._put_batch(t, axis=1)  # noqa: E731
        return (put(instr), put(valid), put(seq_len), stack(stacked),
                put(final_sobs), stack(rewards), stack(rl_masks),
                put(ended), put(pm_target), rep(base_rng),
                rep(env_noise), rep(mlw), rep(rlw), rep(entw))

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------
    def _encode_fn(self, train: bool):
        key = ("encode", train)
        if key not in self._jit_cache:

            @jax.jit
            def run(params, instr, valid, seq_len, base_rng):
                rngs = ({"dropout": jax.random.fold_in(base_rng, INIT_SALT)}
                        if train else None)
                return self.policy.apply(
                    params, instr, valid, seq_len,
                    deterministic=not train, rngs=rngs,
                    method=DasaPolicy.encode_text)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _noise_fn(self):
        if "noise" not in self._jit_cache:
            p = self.cfg.featdropout

            @jax.jit
            def run(base_rng):
                rng = jax.random.fold_in(base_rng, NOISE_SALT)
                keep = jax.random.bernoulli(
                    rng, 1.0 - p, (self.cfg.feature_size,))
                return keep.astype(self.dtype) / (1.0 - p)

            self._jit_cache["noise"] = run
        return self._jit_cache["noise"]

    def _act_fn(self, feedback: str, train: bool, use_noise: bool):
        key = ("act", feedback, train, use_noise)
        if key not in self._jit_cache:
            cfg = self.cfg

            @jax.jit
            def run(params, tables, cached, valid, seq_len, state, sobs,
                    t, base_rng, env_noise):
                inputs = make_step_inputs(cfg, tables, sobs)
                step_rng = jax.random.fold_in(base_rng, t)
                # split rng streams (percept=0 / decode=1) so the replay
                # can vmap percepts over time with identical noise
                p_rngs = ({"dropout": jax.random.fold_in(step_rng, 0)}
                          if train else None)
                d_rngs = ({"dropout": jax.random.fold_in(step_rng, 1)}
                          if train else None)
                percept = self.policy.apply(
                    params, cached, valid, seq_len, inputs,
                    deterministic=not train, is_test=not train,
                    env_noise=env_noise if use_noise else None,
                    rngs=p_rngs, method=DasaPolicy.percept_step)
                new_state, logit, value, _aux = self.policy.apply(
                    params, percept, valid, state,
                    sobs["is_first"], deterministic=not train,
                    already_dropfeat=use_noise,
                    rngs=d_rngs, method=DasaPolicy.decode_from_percept)
                logit = logit.astype(jnp.float32)
                masked = jnp.where(sobs["logit_mask"], NEG_INF, logit)
                if feedback == "teacher":
                    action = sobs["teacher"]
                elif feedback == "argmax":
                    action = jnp.argmax(masked, axis=-1)
                elif feedback == "sample":
                    # stream 2: 0=percept dropout, 1=decode dropout
                    action = jax.random.categorical(
                        jax.random.fold_in(step_rng, 2), masked, axis=-1)
                else:
                    raise ValueError(feedback)
                return new_state, action.astype(jnp.int32)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _cast_params_once(self, inner_params):
        """Cast f32 param leaves to the compute dtype ONCE, outside the
        step scan (config.bf16_grad_accum): forward numerics are
        identical — every flax use site casts to self.dtype anyway —
        but the scan's closed-over-weight cotangent carry then
        accumulates in bf16 instead of f32, halving that HBM traffic
        and removing the per-step convert+reduce ops the round-2 trace
        attributed ~15% of the sample pass to (BENCH_NOTES.md)."""
        if not (self.cfg.bf16_grad_accum
                and self.dtype == jnp.bfloat16):
            return inner_params
        return jax.tree_util.tree_map(
            lambda p: p.astype(self.dtype)
            if p.dtype == jnp.float32 else p, inner_params)

    def _make_loss_fn(self, use_noise: bool, n_steps: int):
        cfg = self.cfg
        policy = self.policy

        def loss_fn(inner_params, tables, instr, valid, seq_len,
                    stacked, final_sobs, rewards, rl_masks,
                    final_ended, pm_target, base_rng, env_noise,
                    ml_weight, rl_weight, ent_weight):
            inner_params = self._cast_params_once(inner_params)
            params = {"params": inner_params}
            cached = policy.apply(
                params, instr, valid, seq_len, deterministic=False,
                rngs={"dropout": jax.random.fold_in(base_rng,
                                                    INIT_SALT)},
                method=DasaPolicy.encode_text)
            batch = instr.shape[0]
            dec_h = decoder_state_width(cfg)
            state0 = DecoderState(
                h=jnp.zeros((batch, dec_h), self.dtype),
                c=jnp.zeros((batch, dec_h), self.dtype),
                h1=jnp.zeros((batch, dec_h), self.dtype))

            # ---- percepts: the state-independent encoder work of ALL
            # steps (incl. the A2C bootstrap step) runs as ONE vmapped
            # pass — (T+1)xB-wide matmuls on the MXU instead of per-step
            # B-wide ones.  vmap is semantics-preserving, so per-step
            # dropout masks are bit-identical to the act phase.
            all_sobs = jax.tree_util.tree_map(
                lambda s, f: jnp.concatenate([s, f[None]], axis=0),
                stacked, final_sobs)
            steps_ax = jnp.arange(n_steps + 1, dtype=jnp.int32)

            def percept_one(sobs_t, t):
                inputs = make_step_inputs(cfg, tables, sobs_t)
                step_rng = jax.random.fold_in(base_rng, t)
                return policy.apply(
                    params, cached, valid, seq_len, inputs,
                    deterministic=False, is_test=False,
                    env_noise=env_noise if use_noise else None,
                    rngs={"dropout": jax.random.fold_in(step_rng, 0)},
                    method=DasaPolicy.percept_step)

            # remat long replays only: recomputing percepts during
            # backward keeps 35 steps of encoder activations out of HBM;
            # short buckets fit and skip the recompute FLOPs.  In this
            # batched replay the percept IS the per-step block, so
            # remat="percept" checkpoints it at any length (same policy
            # as the fused program's percept_apply).
            if (cfg.remat in ("always", "percept")
                    or (cfg.remat == "auto" and n_steps > 16)):
                percept_one = jax.checkpoint(percept_one)
            elif cfg.remat == "dots":
                percept_one = jax.checkpoint(
                    percept_one,
                    policy=jax.checkpoint_policies.checkpoint_dots)
            percepts = jax.vmap(percept_one)(all_sobs, steps_ax)

            def step(carry, xs):
                state, t = carry
                percept_t, sobs = xs
                d_rng = jax.random.fold_in(
                    jax.random.fold_in(base_rng, t), 1)
                new_state, logit, value, aux = policy.apply(
                    params, percept_t, valid, state,
                    sobs["is_first"], deterministic=False,
                    already_dropfeat=use_noise,
                    rngs={"dropout": d_rng},
                    method=DasaPolicy.decode_from_percept)
                logit = logit.astype(jnp.float32)
                masked = jnp.where(sobs["logit_mask"], NEG_INF, logit)
                logp = jax.nn.log_softmax(masked, axis=-1)
                p = jnp.exp(logp)
                # IL: CE vs teacher, ignoring ended rows
                ce = -jnp.take_along_axis(
                    logp, sobs["teacher"][:, None], axis=1)[:, 0]
                ce = jnp.where(sobs["active"], ce, 0.0)
                # RL bookkeeping for the taken action
                logp_a = jnp.take_along_axis(
                    logp, sobs["action"][:, None], axis=1)[:, 0]
                ent = _entropy(logp, p)
                outs = {"ce": ce, "logp_a": logp_a, "ent": ent,
                        "value": value.astype(jnp.float32)}
                if cfg.pred_back:
                    back = jnp.where(sobs["logit_mask"], NEG_INF,
                                     aux["back_logit"].astype(
                                         jnp.float32))
                    blogp = jax.nn.log_softmax(back, axis=-1)
                    outs["back_ce"] = -jnp.take_along_axis(
                        blogp, sobs["back_teacher"][:, None],
                        axis=1)[:, 0]
                if cfg.pred_pm:
                    # progress-monitor MSE vs the episode-start progress
                    # (the reference captures `progresses` once before
                    # the step loop — agent_dg.py:683, 864-866 — and the
                    # per-step loss is unmasked over rows); padded steps
                    # (all-ended) are excluded like the reference's break
                    pm = aux["pm_score"].astype(jnp.float32)
                    real = sobs["active"].any().astype(jnp.float32)
                    outs["pm_mse"] = jnp.mean((pm - pm_target) ** 2) * real
                if cfg.agent_type == "advanced":
                    # agent_advanced's unconditional progress head
                    # (agent_advanced.py:563-565)
                    pp = aux["pred_progress"].astype(jnp.float32)
                    real = sobs["active"].any().astype(jnp.float32)
                    outs["adv_pm_mse"] = (jnp.mean((pp - pm_target) ** 2)
                                          * real)
                if cfg.agent_type == "mt":
                    # soft-distance KL, mean over this step's valid
                    # entries (agent_mt.py:712-718)
                    kl_row, cnt_row = mt_kl_rows(
                        logp, sobs["teacher"], sobs["cand_point_id"],
                        sobs["cand_n"],
                        sobs["active"] & (sobs["teacher"]
                                          < sobs["cand_n"]))
                    outs["kl"] = kl_row.sum() \
                        / jnp.maximum(cnt_row.sum(), 1.0)
                return (new_state, t + 1), outs

            head = jax.tree_util.tree_map(lambda x: x[:n_steps], percepts)
            (state, _), outs = jax.lax.scan(
                step, (state0, jnp.asarray(0, jnp.int32)),
                (head, stacked))

            ml_loss = outs["ce"].sum()
            forth_loss = ml_loss
            if cfg.pred_back:
                ml_loss = ml_loss + cfg.back_weight * outs["back_ce"].sum()

            logs = {"forth_loss": forth_loss,
                    "entropy": outs["ent"].sum()}
            if cfg.pred_pm:
                pm_total = cfg.pm_weight * outs["pm_mse"].sum()
                ml_loss = ml_loss + pm_total
                logs["pm_loss"] = pm_total
            if cfg.agent_type == "advanced":
                adv_pm = outs["adv_pm_mse"].sum()
                # fixed x10 weight (agent_advanced.py:564); logged raw
                ml_loss = ml_loss + 10.0 * adv_pm
                logs["pm_loss"] = adv_pm
            if cfg.agent_type == "mt":
                # rides the ml scaling: loss += kl * train_ml / batch
                # (agent_mt.py:871); logged raw like the reference (801)
                kl_total = outs["kl"].sum()
                ml_loss = ml_loss + kl_total
                logs["kl_loss"] = kl_total
            total_loss = ml_weight * ml_loss / batch
            logs["ml_loss"] = ml_loss

            # A2C branch is always traced; rl_weight (0.0 / 1.0)
            # selects it so teacher and sample passes share ONE
            # compiled program (each extra variant costs minutes of
            # XLA compilation on this toolchain)
            percept_f = jax.tree_util.tree_map(
                lambda x: x[n_steps], percepts)
            d_rng_f = jax.random.fold_in(
                jax.random.fold_in(base_rng, n_steps), 1)
            _, _, last_value, _ = policy.apply(
                params, percept_f, valid, state,
                final_sobs["is_first"], deterministic=False,
                already_dropfeat=use_noise,
                rngs={"dropout": d_rng_f},
                method=DasaPolicy.decode_from_percept)
            last_value = jax.lax.stop_gradient(
                last_value.astype(jnp.float32))
            g0 = jnp.where(final_ended, 0.0, last_value)

            def rev_step(g, xs):
                r, v, logp_a, ent, m = xs
                g = g * cfg.gamma + r
                adv = jax.lax.stop_gradient(g - v)
                pol = (-logp_a * adv * m).sum()
                val = 0.5 * (((g - v) ** 2) * m).sum()
                step_loss = pol + val + (-ent_weight * ent * m).sum()
                return g, (step_loss, val)

            _, (step_losses, critic_losses) = jax.lax.scan(
                rev_step, g0,
                (rewards, outs["value"], outs["logp_a"],
                 outs["ent"], rl_masks),
                reverse=True)
            rl_loss = step_losses.sum()
            total = rl_masks.sum()
            if cfg.normalize_loss == "total":
                rl_loss = rl_loss / jnp.maximum(total, 1.0)
            elif cfg.normalize_loss == "batch":
                rl_loss = rl_loss / batch
            total_loss = total_loss + rl_weight * rl_loss
            logs["rl_loss"] = rl_weight * rl_loss
            logs["critic_loss"] = rl_weight * critic_losses.sum()
            logs["total"] = total

            logs["loss"] = total_loss
            return total_loss, logs

        return loss_fn

    def _grad_fn(self, use_noise: bool, n_steps: int):
        key = ("grad", use_noise, n_steps)
        if key not in self._jit_cache:
            loss_fn = self._make_loss_fn(use_noise, n_steps)

            @jax.jit
            def run(params, tables, *args):
                (loss, logs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params["params"], tables,
                                           *args)
                return grads, logs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _grad_pair_fn(self, use_noise: bool, n_steps: int):
        """Two independent replays (teacher-ML pass + sampled-RL pass)
        fused into ONE program via vmap over a leading slice axis: one
        dispatch, one backward, and XLA batches the paired matmuls.
        Exactness is preserved — vmap keeps each slice's shapes and PRNG
        keys identical to the separate programs."""
        key = ("gradpair", use_noise, n_steps)
        if key not in self._jit_cache:
            loss_fn = self._make_loss_fn(use_noise, n_steps)

            @jax.jit
            def run(params, tables, *args):
                def total(inner):
                    losses, logs = jax.vmap(
                        loss_fn,
                        in_axes=(None, None) + (0,) * len(args))(
                        inner, tables, *args)
                    return losses.sum(), logs

                (loss, logs), grads = jax.value_and_grad(
                    total, has_aux=True)(params["params"])
                return grads, logs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # fused device rollout: acting, env transitions, rewards, and the
    # IL+A2C gradient in ONE jitted program (zero host round-trips).
    # The graph walk is table gathers (env/device_env.py); through the
    # remote-TPU tunnel every host fetch costs ~25-100 ms, so the
    # host-driven step loop is latency-bound — this path isn't.
    # ------------------------------------------------------------------
    def _make_device_loss_fn(self, feedback: str, use_noise: bool):
        """On-device training pass; the program SHAPE depends on who
        picks the actions (both shapes are grad-exact vs the host
        act/replay path — tests/test_device_env.py):

        - teacher: act -> batched replay.  The shortest-path walk needs
          no policy (pure table gathers), and teacher episodes end fast,
          so the whole forward+backward runs as ONE batched-percept
          replay over the short bucket — (T*B)-row MXU matmuls instead
          of T sequential B-row scan steps.  Measured ~2x the fused
          teacher pass on v5e.
        - sample/argmax: ONE fused scan computing forward, env
          transition, and loss per step with an all-ended early-exit
          cond.  An act+replay split here runs the policy forward twice
          AND pads the replay to the episode-length bucket; sampled
          episodes run long (a cold policy wanders for most of
          max_action), so the padded batched replay LOSES to the fused
          scan that skips ended steps — measured 628 (fused) vs 488
          (split) agent-steps/s on v5e (BENCH_NOTES.md)."""
        if feedback == "teacher":
            return self._make_device_split_loss_fn(use_noise)
        return self._make_device_fused_loss_fn(feedback, use_noise)

    def _make_device_split_loss_fn(self, use_noise: bool):
        """Teacher-feedback device pass: no-grad gather-only act scan,
        then ONE batched-percept replay (the body of _make_loss_fn).

        The program is sized to the dataset: a teacher walk takes at
        most max(len(item.path)) steps (shortest-path moves + STOP), so
        the replay pads to that bound instead of max_action — at the
        headline config that is an 8-step replay instead of a 35-step
        one, below the remat threshold.  Padded steps are fully masked,
        so gradients are unchanged (tests/test_device_env.py)."""
        from dasa_tpu.env.device_env import device_obs, device_transition

        cfg = self.cfg
        T = self._teacher_len()
        k = cfg.max_candidates
        body = self._make_loss_fn(use_noise, T)
        REC_KEYS = ("feat_row", "view_index", "heading", "elevation",
                    "cand_point_id", "cand_heading", "cand_elevation",
                    "cand_n", "teacher", "back_teacher", "logit_mask")

        def loss_fn(inner_params, tables, env_arrays, node0, view0, goal,
                    start, instr, valid, seq_len, base_rng, env_noise,
                    ml_weight, rl_weight, ent_weight):
            ng = jax.lax.stop_gradient
            batch = instr.shape[0]
            dist_t, node_base_t = env_arrays[6], env_arrays[8]
            goal_local = goal - node_base_t[goal]
            total_dist = dist_t[node0, goal_local]
            # episode-start progress (pm target; = 0 up to the eps term)
            pm_target = 1.0 - total_dist / (total_dist + 1e-10)

            def record_from(sobs, ended, is_first):
                rec = {key: sobs[key] for key in REC_KEYS}
                rec["active"] = ~ended
                rec["is_first"] = jnp.broadcast_to(is_first, (batch,))
                return rec

            def env_and_reward(sobs, node, view, a, ended):
                """Transition + reward shaping (agent_dg.py:900-926)."""
                new_node, new_view, stop = device_transition(
                    env_arrays, node, view, a, ended)
                dist_new = dist_t[new_node, goal_local]
                delta = -(dist_new - sobs["distance"])
                move_r = jnp.where(delta > 0, 1.0,
                                   jnp.where(delta < 0, -1.0, 0.0))
                stop_r = jnp.where(dist_new < 3.0, 2.0, -2.0)
                stop_now = stop & ~ended
                reward = jnp.where(
                    ended, 0.0, jnp.where(stop_now, stop_r, move_r))
                return (new_node, new_view, ended | stop,
                        reward.astype(jnp.float32))

            # ---- phase A: teacher trajectory (pure gathers, no policy)
            def act_step(carry, t):
                node, view, ended = carry
                sobs = device_obs(env_arrays, node, view, goal,
                                  start, total_dist, k)
                a = sobs["teacher"]
                rec = record_from(sobs, ended, t == 0)
                rec["action"] = jnp.minimum(a, sobs["cand_n"])
                node, view, new_ended, reward = env_and_reward(
                    sobs, node, view, a, ended)
                mask = (~ended).astype(jnp.float32)
                return (node, view, new_ended), (rec, reward, mask)

            carry0 = (node0, view0, jnp.zeros((batch,), bool))
            (node_f, view_f, ended_f), (stacked, rewards, rl_masks) = \
                jax.lax.scan(act_step, carry0,
                             jnp.arange(T, dtype=jnp.int32))

            stacked = ng(stacked)
            rewards, rl_masks = ng(rewards), ng(rl_masks)
            env_steps = stacked["active"].sum().astype(jnp.int32)

            sobs_f = device_obs(env_arrays, node_f, view_f, goal, start,
                                total_dist, k)
            final_sobs = record_from(sobs_f, ended_f, False)
            final_sobs["action"] = jnp.zeros((batch,), jnp.int32)

            # ---- phase B: one batched replay over the teacher bound ----
            total_loss, logs = body(
                inner_params, tables, instr, valid, seq_len, stacked,
                final_sobs, rewards, rl_masks, ended_f, pm_target,
                base_rng, env_noise, ml_weight, rl_weight, ent_weight)
            logs["env_steps"] = env_steps
            return total_loss, logs

        return loss_fn

    def _teacher_len(self) -> int:
        """Step bound for teacher-forced episodes: the longest dataset
        path (moves = shortest-path hops <= len(path)-1, + STOP), +1
        margin, capped at max_action."""
        T = self.cfg.max_action
        if self.env is None or not getattr(self.env, "data", None):
            return T
        max_path = max(len(item["path"]) for item in self.env.data)
        return min(T, max_path + 1)

    def _make_device_fused_loss_fn(self, feedback: str, use_noise: bool,
                                   combined: bool = False, t1: int = 0):
        """Sample/argmax device pass: ONE scan computing forward, env
        transition, reward, and loss bookkeeping per step, with an
        all-ended early-exit cond (the A2C tail runs reversed over the
        recorded outs).  See _make_device_loss_fn for why this beats an
        act/replay split under sampled feedback.

        combined=True builds the SLOT-WEIGHTED variant that runs the
        teacher-ML pass and the sampled-RL pass of one optimizer
        iteration as a single 2x-wide program (the two passes share per
        -step weight reads, and the MXU rows at batch 20 are mostly
        padding — measured scaling in BENCH_NOTES.md).  Inputs change
        meaning: ml_weight/rl_weight/ent_weight become per-slot (B,)
        vectors (ml_weight pre-divided by the pass batch so loss
        normalization is host-folded), env_noise is per-slot (B, 1, F)
        (each pass keeps its own featdrop mask), and a trailing
        is_sample (B,) bool selects policy-picked vs teacher actions
        per slot.  Per-pass losses/grads equal the split programs'
        exactly when dropout is inactive (tests/test_combined.py).

        t1 (combined only): the env's _teacher_len.  Teacher slots walk
        the shortest path, so they are PROVABLY all ended after t1
        steps — when 0 < t1 < T the scan drops to pass-width B for
        steps [t1, T) (and for the A2C bootstrap forward), skipping the
        dead teacher rows' compute.  Exact: ended rows contribute
        zeros, and every per-row op is row-independent."""
        from dasa_tpu.env.device_env import device_obs, device_transition

        cfg = self.cfg
        policy = self.policy
        T = cfg.max_action
        k = cfg.max_candidates

        def loss_fn(inner_params, tables, env_arrays, node0, view0, goal,
                    start, instr, valid, seq_len, base_rng, env_noise,
                    ml_weight, rl_weight, ent_weight, is_sample=None):
            inner_params = self._cast_params_once(inner_params)
            params = {"params": inner_params}
            cached = policy.apply(
                params, instr, valid, seq_len, deterministic=False,
                rngs={"dropout": jax.random.fold_in(base_rng, INIT_SALT)},
                method=DasaPolicy.encode_text)
            batch = instr.shape[0]
            dist_t, node_base_t = env_arrays[6], env_arrays[8]
            goal_local = goal - node_base_t[goal]
            total_dist = dist_t[node0, goal_local]
            # episode-start progress (pm target; = 0 up to the eps term)
            pm_target = 1.0 - total_dist / (total_dist + 1e-10)
            dec_h = decoder_state_width(cfg)
            state0 = DecoderState(
                h=jnp.zeros((batch, dec_h), self.dtype),
                c=jnp.zeros((batch, dec_h), self.dtype),
                h1=jnp.zeros((batch, dec_h), self.dtype))
            # pm normalization uses the PASS batch (the split programs
            # normalize per pass), not the current segment width
            pass_b = batch // 2 if combined else batch

            def make_segment(sub):
                """Per-step machinery over a batch sub-slice.  sub is
                identity for the full-width segment; for the tail
                segment it selects the sample half (teacher rows are
                all ended there — see t1 in the docstring)."""
                cached_s = jax.tree_util.tree_map(sub, cached)
                valid_s, seq_len_s = sub(valid), sub(seq_len)
                noise_s = (sub(env_noise)
                           if env_noise is not None and combined
                           else env_noise)
                pm_target_s = sub(pm_target)
                goal_s, start_s = sub(goal), sub(start)
                goal_local_s, total_dist_s = (sub(goal_local),
                                              sub(total_dist))
                mlw_s = sub(ml_weight) if combined else ml_weight
                iss_s = sub(is_sample) if combined else None
                width = valid_s.shape[0]

                def percept_apply(inner, inputs, drop_rng):
                    return policy.apply(
                        {"params": inner}, cached_s, valid_s, seq_len_s,
                        inputs, deterministic=False, is_test=False,
                        env_noise=noise_s if use_noise else None,
                        rngs={"dropout": drop_rng},
                        lstm_pallas=self._lstm_pallas,
                        method=DasaPolicy.percept_step)

                if cfg.remat == "percept":
                    # middle remat point: recompute only the encoder
                    # block during backward; its residuals (per-token
                    # activations of the cross layers + top LSTM)
                    # dominate the scan's saved-state traffic, while
                    # its inputs are small
                    percept_apply = jax.checkpoint(percept_apply)

                def policy_losses(sobs, state, t, active):
                    """Shared per-step forward + IL/RL bookkeeping (the
                    replay body of _make_loss_fn, fed device obs)."""
                    inputs = make_step_inputs(cfg, tables, sobs)
                    step_rng = jax.random.fold_in(base_rng, t)
                    percept = percept_apply(
                        inner_params, inputs,
                        jax.random.fold_in(step_rng, 0))
                    new_state, logit, value, aux = policy.apply(
                        params, percept, valid_s, state,
                        sobs["is_first"],
                        deterministic=False, already_dropfeat=use_noise,
                        rngs={"dropout": jax.random.fold_in(step_rng,
                                                            1)},
                        method=DasaPolicy.decode_from_percept)
                    logit = logit.astype(jnp.float32)
                    masked = jnp.where(sobs["logit_mask"], NEG_INF,
                                       logit)
                    logp = jax.nn.log_softmax(masked, axis=-1)
                    p = jnp.exp(logp)
                    if feedback == "sample":
                        a = jax.random.categorical(
                            jax.random.fold_in(step_rng, 2), masked,
                            axis=-1)
                    else:  # argmax
                        a = jnp.argmax(masked, axis=-1)
                    if combined:  # teacher slots walk shortest path
                        a = jnp.where(iss_s, a, sobs["teacher"])
                    a = jax.lax.stop_gradient(a).astype(jnp.int32)
                    a_rec = jnp.minimum(a, sobs["cand_n"])
                    ce = -jnp.take_along_axis(
                        logp, sobs["teacher"][:, None], axis=1)[:, 0]
                    ce = jnp.where(active, ce, 0.0)
                    logp_a = jnp.take_along_axis(
                        logp, a_rec[:, None], axis=1)[:, 0]
                    outs = {"ce": ce, "logp_a": logp_a,
                            "ent": _entropy(logp, p),
                            "value": value.astype(jnp.float32)}
                    if cfg.pred_back:
                        back = jnp.where(
                            sobs["logit_mask"], NEG_INF,
                            aux["back_logit"].astype(jnp.float32))
                        blogp = jax.nn.log_softmax(back, axis=-1)
                        outs["back_ce"] = -jnp.take_along_axis(
                            blogp, sobs["back_teacher"][:, None],
                            axis=1)[:, 0]
                    if cfg.pred_pm:
                        pm = aux["pm_score"].astype(jnp.float32)
                        sq = (pm - pm_target_s) ** 2
                        if combined:
                            # split semantics: pm reaches total_loss as
                            # ml_w * pm_w * mean_b(sq) / pass_batch;
                            # the per-slot ml_weight carries one
                            # /pass_batch, so divide the weighted sum
                            # by pass_batch again
                            mlrow = mlw_s > 0
                            real = (active
                                    & mlrow).any().astype(jnp.float32)
                            outs["pm_mse"] = ((sq * mlw_s).sum()
                                              / pass_b) * real
                        else:
                            real = active.any().astype(jnp.float32)
                            outs["pm_mse"] = jnp.mean(sq) * real
                    if cfg.agent_type == "advanced":
                        pp = aux["pred_progress"].astype(jnp.float32)
                        sq = (pp - pm_target_s) ** 2
                        if combined:
                            mlrow = mlw_s > 0
                            real = (active
                                    & mlrow).any().astype(jnp.float32)
                            outs["adv_pm_mse"] = ((sq * mlw_s).sum()
                                                  / pass_b) * real
                        else:
                            real = active.any().astype(jnp.float32)
                            outs["adv_pm_mse"] = jnp.mean(sq) * real
                    if cfg.agent_type == "mt":
                        # soft-distance KL (agent_mt.py:712-718): per-
                        # step mean over the pass's valid entries
                        kl_row, cnt_row = mt_kl_rows(
                            logp, sobs["teacher"], sobs["cand_point_id"],
                            sobs["cand_n"],
                            active & (sobs["teacher"] < sobs["cand_n"]))
                        if combined:
                            # per-HALF means x that half's ml row weight
                            # (= ml_scalar/pass_b) keep the split
                            # programs' exact contributions
                            def half_kl(hmask):
                                s = jnp.where(hmask, kl_row, 0.0).sum()
                                c = jnp.where(hmask, cnt_row, 0.0).sum()
                                return s / jnp.maximum(c, 1.0)

                            outs["kl_w"] = (
                                half_kl(~iss_s) * (mlw_s * ~iss_s).max()
                                + half_kl(iss_s) * (mlw_s * iss_s).max())
                        else:
                            outs["kl"] = kl_row.sum() \
                                / jnp.maximum(cnt_row.sum(), 1.0)
                    return new_state, a, outs

                def zero_outs():
                    z = jnp.zeros((width,), jnp.float32)
                    outs = {"ce": z, "logp_a": z, "ent": z, "value": z,
                            "reward": z, "rl_mask": z,
                            "env_steps": jnp.asarray(0, jnp.int32)}
                    if cfg.pred_back:
                        outs["back_ce"] = z
                    if cfg.pred_pm:
                        outs["pm_mse"] = jnp.asarray(0.0, jnp.float32)
                    if cfg.agent_type == "advanced":
                        outs["adv_pm_mse"] = jnp.asarray(0.0,
                                                         jnp.float32)
                    if cfg.agent_type == "mt":
                        outs["kl_w" if combined else "kl"] = jnp.asarray(
                            0.0, jnp.float32)
                    return outs

                def real_step(carry, t):
                    node, view, ended, state = carry
                    active = ~ended
                    sobs = device_obs(env_arrays, node, view, goal_s,
                                      start_s, total_dist_s, k)
                    sobs["is_first"] = jnp.broadcast_to(t == 0,
                                                        (width,))
                    new_state, a, outs = policy_losses(sobs, state, t,
                                                       active)
                    new_node, new_view, stop = device_transition(
                        env_arrays, node, view, a, ended)
                    # reward shaping (rollout / agent_dg.py:900-926)
                    dist_new = dist_t[new_node, goal_local_s]
                    delta = -(dist_new - sobs["distance"])
                    move_r = jnp.where(delta > 0, 1.0,
                                       jnp.where(delta < 0, -1.0, 0.0))
                    stop_r = jnp.where(dist_new < 3.0, 2.0, -2.0)
                    stop_now = stop & active
                    outs["reward"] = jnp.where(
                        ended, 0.0, jnp.where(stop_now, stop_r, move_r)
                    ).astype(jnp.float32)
                    outs["rl_mask"] = active.astype(jnp.float32)
                    outs["env_steps"] = active.sum().astype(jnp.int32)
                    return (new_node, new_view, ended | stop,
                            new_state), outs

                # remat long rollouts (bounded residual memory) unless
                # the config trades HBM for backward recompute FLOPs
                if cfg.remat == "always" or (cfg.remat == "auto"
                                             and T > 16):
                    real_step = jax.checkpoint(real_step)
                elif cfg.remat == "dots":
                    # keep MXU outputs, recompute elementwise chains in
                    # the backward: trades cheap VPU FLOPs for the
                    # scan's saved-residual HBM traffic
                    real_step = jax.checkpoint(
                        real_step,
                        policy=jax.checkpoint_policies.checkpoint_dots)

                def body(carry, t):
                    ended = carry[2]
                    return jax.lax.cond(ended.all(),
                                        lambda c, _t: (c, zero_outs()),
                                        real_step, carry, t)

                return body, policy_losses

            body_full, pl_full = make_segment(lambda x: x)
            ended0 = jnp.zeros((batch,), bool)
            carry0 = (node0, view0, ended0, state0)
            segmented = combined and 0 < t1 < T
            # NOTE: unrolling this outer scan measured SLOWER (972 vs
            # ~1100 agent-steps/s at unroll=5) — the early-exit cond
            # carries the win here, not DMA batching
            if segmented:
                sub_tail = lambda x: x[pass_b:]  # noqa: E731
                body_tail, pl_tail = make_segment(sub_tail)
                carry_a, outs_a = jax.lax.scan(
                    body_full, carry0, jnp.arange(t1, dtype=jnp.int32))
                carry_b0 = jax.tree_util.tree_map(sub_tail, carry_a)
                ts_tail = jnp.arange(t1, T, dtype=jnp.int32)
                half = pass_b // 2
                if T - t1 >= 4 and half >= 2:
                    # second narrowing, at runtime: most sample rows end
                    # before the batch max, so when at most half are
                    # still active at t1, gather them into a half-width
                    # scan (width-10 steps measured 0.71x width-20,
                    # BENCH_NOTES.md) and scatter the outs back.  Exact
                    # for the same reason as the static narrowing.
                    ended_t1 = carry_b0[2]

                    def packed_tail(carry_b0):
                        perm = jnp.argsort(ended_t1)[:half]  # active 1st

                        def sub_p(x):
                            return jnp.take(x[pass_b:], perm, axis=0)

                        body_p, _ = make_segment(sub_p)
                        carry_p, outs_p = jax.lax.scan(
                            body_p,
                            jax.tree_util.tree_map(
                                lambda x: jnp.take(x, perm, axis=0),
                                carry_b0),
                            ts_tail)
                        carry_f = jax.tree_util.tree_map(
                            lambda full, p: full.at[perm].set(p),
                            carry_b0, carry_p)

                        def scat(full_like, p):
                            if p.ndim >= 2 and p.shape[1] == half:
                                z = jnp.zeros(
                                    (p.shape[0], pass_b) + p.shape[2:],
                                    p.dtype)
                                return z.at[:, perm].set(p)
                            return p  # per-step scalars

                        outs_f = jax.tree_util.tree_map(
                            lambda p: scat(None, p), outs_p)
                        return carry_f, outs_f

                    def full_tail(carry_b0):
                        return jax.lax.scan(body_tail, carry_b0,
                                            ts_tail)

                    carry_b, outs_b = jax.lax.cond(
                        (~ended_t1).sum() <= half,
                        packed_tail, full_tail, carry_b0)
                else:
                    carry_b, outs_b = jax.lax.scan(body_tail, carry_b0,
                                                   ts_tail)

                def cat_time(a, b):
                    # pad tail outs back to full width (teacher rows
                    # are ended there: their outs are exactly zero)
                    if b.ndim >= 2 and b.shape[1] == pass_b:
                        b = jnp.concatenate(
                            [jnp.zeros_like(b, shape=(b.shape[0],
                                                      batch - pass_b)
                                            + b.shape[2:]), b], axis=1)
                    return jnp.concatenate([a, b], axis=0)

                outs = jax.tree_util.tree_map(cat_time, outs_a, outs_b)
                node, view, ended, state = carry_b
                goal_f, start_f = goal[pass_b:], start[pass_b:]
                total_dist_f = total_dist[pass_b:]
                boot_pl = pl_tail
                boot_width = batch - pass_b
            else:
                (node, view, ended, state), outs = jax.lax.scan(
                    body_full, carry0, jnp.arange(T, dtype=jnp.int32))
                goal_f, start_f, total_dist_f = goal, start, total_dist
                boot_pl = pl_full
                boot_width = batch

            if combined:
                # ml_weight rows carry ml_scalar/pass_batch, so the
                # weighted sums below equal each split pass's normalized
                # ml term; rows of the RL half have ml_weight == 0
                w = ml_weight[None, :]
                ml_loss = (outs["ce"] * w).sum()
                forth_loss = ml_loss
                if cfg.pred_back:
                    ml_loss = ml_loss + cfg.back_weight * (
                        outs["back_ce"] * w).sum()
            else:
                ml_loss = outs["ce"].sum()
                forth_loss = ml_loss
                if cfg.pred_back:
                    ml_loss = ml_loss \
                        + cfg.back_weight * outs["back_ce"].sum()
            logs = {"forth_loss": forth_loss,
                    "entropy": outs["ent"].sum(),
                    "env_steps": outs["env_steps"].sum()}
            if cfg.pred_pm:
                pm_total = cfg.pm_weight * outs["pm_mse"].sum()
                ml_loss = ml_loss + pm_total
                logs["pm_loss"] = pm_total
            if cfg.agent_type == "advanced":
                adv_pm = outs["adv_pm_mse"].sum()
                ml_loss = ml_loss + 10.0 * adv_pm
                logs["pm_loss"] = adv_pm
            if cfg.agent_type == "mt":
                # combined: kl_w already carries ml_scalar/pass_b per
                # half; split: rides ml_weight/batch (agent_mt.py:871)
                kl_total = outs["kl_w" if combined else "kl"].sum()
                ml_loss = ml_loss + kl_total
                logs["kl_loss"] = kl_total
            total_loss = ml_loss if combined else ml_weight * ml_loss / batch
            logs["ml_loss"] = ml_loss

            # A2C bootstrap at t=T on the final state (sample-half
            # width when segmented: teacher rows are ended, g0 = 0)
            sobs_f = device_obs(env_arrays, node, view, goal_f, start_f,
                                total_dist_f, k)
            sobs_f["is_first"] = jnp.zeros((boot_width,), bool)
            _, _, last_outs = boot_pl(sobs_f, state,
                                      jnp.asarray(T, jnp.int32),
                                      ~ended)
            last_value = jax.lax.stop_gradient(last_outs["value"])
            g0 = jnp.where(ended, 0.0, last_value)
            if segmented:
                g0 = jnp.concatenate(
                    [jnp.zeros((batch - boot_width,), g0.dtype), g0])

            def rev_step(g, xs):
                r, v, logp_a, ent, m = xs
                g = g * cfg.gamma + r
                adv = jax.lax.stop_gradient(g - v)
                if combined:
                    # rl_weight rows are the RL-slot indicator; ent
                    # weight is per-slot (0 on the teacher half)
                    row = (-logp_a * adv * m) \
                        + 0.5 * (((g - v) ** 2) * m) \
                        + (-ent_weight * ent * m)
                    step_loss = (row * rl_weight).sum()
                    val = (0.5 * (((g - v) ** 2) * m) * rl_weight).sum()
                else:
                    pol = (-logp_a * adv * m).sum()
                    val = 0.5 * (((g - v) ** 2) * m).sum()
                    step_loss = pol + val + (-ent_weight * ent * m).sum()
                return g, (step_loss, val)

            _, (step_losses, critic_losses) = jax.lax.scan(
                rev_step, g0,
                (outs["reward"], outs["value"], outs["logp_a"],
                 outs["ent"], outs["rl_mask"]), reverse=True)
            rl_loss = step_losses.sum()
            if combined:
                # per-pass normalizers over the RL slots only
                total = (outs["rl_mask"] * rl_weight[None, :]).sum()
                if cfg.normalize_loss == "total":
                    rl_loss = rl_loss / jnp.maximum(total, 1.0)
                elif cfg.normalize_loss == "batch":
                    rl_loss = rl_loss / jnp.maximum(rl_weight.sum(), 1.0)
                total_loss = total_loss + rl_loss
                logs["rl_loss"] = rl_loss
                logs["critic_loss"] = critic_losses.sum()
            else:
                total = outs["rl_mask"].sum()
                if cfg.normalize_loss == "total":
                    rl_loss = rl_loss / jnp.maximum(total, 1.0)
                elif cfg.normalize_loss == "batch":
                    rl_loss = rl_loss / batch
                total_loss = total_loss + rl_weight * rl_loss
                logs["rl_loss"] = rl_weight * rl_loss
                logs["critic_loss"] = rl_weight * critic_losses.sum()
            logs["total"] = total
            logs["loss"] = total_loss
            return total_loss, logs

        return loss_fn

    def _device_grad_fn(self, feedback: str, use_noise: bool):
        # the teacher program is sized to the current env's longest path
        # (_teacher_len), which changes when the trainer swaps the
        # org/aug env — key the cache on it
        t_len = self._teacher_len() if feedback == "teacher" else 0
        key = ("devgrad", feedback, use_noise, t_len)
        if key not in self._jit_cache:
            loss_fn = self._make_device_loss_fn(feedback, use_noise)

            @jax.jit
            def run(params, tables, env_arrays, *args):
                (loss, logs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params["params"], tables,
                                           env_arrays, *args)
                return grads, logs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _device_grad_acc_fn(self, feedback: str, use_noise: bool):
        """Rollout-grad variant that adds carried-in gradients inside
        the program (XLA fuses the add into the backward's grad writes),
        replacing the separate tree-add dispatch between the teacher and
        sample passes of one optimizer iteration."""
        t_len = self._teacher_len() if feedback == "teacher" else 0
        key = ("devgradacc", feedback, use_noise, t_len)
        if key not in self._jit_cache:
            loss_fn = self._make_device_loss_fn(feedback, use_noise)

            @functools.partial(jax.jit, donate_argnums=(3,))
            def run(params, tables, env_arrays, grads_in, *args):
                (loss, logs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params["params"], tables,
                                           env_arrays, *args)
                grads = jax.tree_util.tree_map(jnp.add, grads, grads_in)
                return grads, logs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _device_combined_grad_fn(self, feedback: str, use_noise: bool,
                                 accumulate: bool):
        """Rollout-grad over the slot-weighted combined program (both
        passes of one optimizer iteration in one 2B-wide scan that
        narrows to B-wide once the teacher half is provably ended).
        t1 depends on the env's longest path, which changes when the
        trainer swaps org/aug envs — key the cache on it."""
        t1 = self._teacher_len()
        key = ("devcomb", feedback, use_noise, accumulate, t1)
        if key not in self._jit_cache:
            loss_fn = self._make_device_fused_loss_fn(
                feedback, use_noise, combined=True, t1=t1)

            if accumulate:
                @functools.partial(jax.jit, donate_argnums=(3,))
                def run(params, tables, env_arrays, grads_in, *args):
                    (loss, logs), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params["params"], tables,
                                               env_arrays, *args)
                    grads = jax.tree_util.tree_map(jnp.add, grads,
                                                   grads_in)
                    return grads, logs
            else:
                @jax.jit
                def run(params, tables, env_arrays, *args):
                    (loss, logs), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params["params"], tables,
                                               env_arrays, *args)
                    return grads, logs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _device_combined_args(self, feedback: str,
                              train_ml: Optional[float],
                              train_rl: bool, speaker=None):
        """Two env minibatches (teacher-ML half, policy-RL half) and the
        per-slot weight vectors for the combined program.  Advances the
        env iterator twice and the rollout rng counter by two, matching
        the split passes' data/rng stream structure.  `speaker`
        back-translates EACH half's minibatch with that half's featdrop
        mask, like the reference's per-vl_rollout infer_batch
        (agent_dg.py:656-675)."""
        from dasa_tpu.env.device_env import episode_inputs

        cfg = self.cfg
        env = self.env
        dev = self._device_env_tables()
        B = cfg.batch_size

        rng_t = jax.random.fold_in(self._base_rng, self._rollout_counter)
        rng_s = jax.random.fold_in(self._base_rng,
                                   self._rollout_counter + 1)
        self._rollout_counter += 2
        if cfg.consistent_drop or speaker is not None:
            # one featdrop mask per pass (values identical to the split
            # programs' _noise_fn draws — tests/test_combined.py)
            noise = jnp.stack([self._noise_fn()(rng_t),
                               self._noise_fn()(rng_s)])
        else:
            noise = jnp.ones((2, cfg.feature_size), self.dtype)

        def grab(rng, noise_row):
            env.reset()
            if speaker is not None:
                speaker.relabel_batch(env, noise_row, rng)
            ep = episode_inputs(env, dev)
            st = env._static
            return (ep, st["instr"].copy(), ~st["pad_mask"],
                    st["seq_len"].copy())

        ep1, instr1, valid1, len1 = grab(rng_t, noise[0])  # teacher-ML
        ep2, instr2, valid2, len2 = grab(rng_s, noise[1])  # policy-RL
        env_noise = jnp.repeat(noise, B, axis=0)[:, None, :]

        mlw = float(train_ml if train_ml is not None else 0.0) / B
        ml_w = np.concatenate([np.full(B, mlw, np.float32),
                               np.zeros(B, np.float32)])
        rlw = 1.0 if train_rl else 0.0
        rl_w = np.concatenate([np.zeros(B, np.float32),
                               np.full(B, rlw, np.float32)])
        ent = 0.01 if (train_rl and feedback == "sample") else 0.0
        ent_w = np.concatenate([np.zeros(B, np.float32),
                                np.full(B, ent, np.float32)])
        is_sample = np.concatenate([np.zeros(B, bool), np.ones(B, bool)])

        def cat(a, b):
            return self._put_batch(np.concatenate([np.asarray(a),
                                                   np.asarray(b)], 0))

        return (cat(ep1["node0"], ep2["node0"]),
                cat(ep1["view0"], ep2["view0"]),
                cat(ep1["goal"], ep2["goal"]),
                cat(ep1["start"], ep2["start"]),
                cat(instr1, instr2), cat(valid1, valid2),
                cat(len1, len2), rng_t, env_noise,
                self._put_batch(ml_w), self._put_batch(rl_w),
                self._put_batch(ent_w), self._put_batch(is_sample))

    def use_combined_rollout(self) -> bool:
        """The teacher-ML + sampled-RL accumulate pair runs as ONE
        2B-wide device program when enabled (cfg.fuse_passes) and the
        ML half exists (ml_weight != 0)."""
        return (self.cfg.fuse_passes == "auto"
                and self.use_device_rollout())

    def device_rollout_combined(self, train_ml: Optional[float],
                                feedback: str = "sample",
                                speaker=None) -> None:
        """Both passes of one accumulate_gradient('sample') call as a
        single fused act+grad dispatch; fetches nothing."""
        use_noise = self.cfg.consistent_drop or speaker is not None
        args = self._device_combined_args(feedback, train_ml, True,
                                          speaker=speaker)
        if self._grad_accum is None:
            grads, logs = self._device_combined_grad_fn(
                feedback, use_noise, False)(
                self.params, self.tables, self._dev_env.arrays(), *args)
        else:  # aug alternation: accumulate inside the program
            grads, logs = self._device_combined_grad_fn(
                feedback, use_noise, True)(
                self.params, self.tables, self._dev_env.arrays(),
                self._grad_accum, *args)
        self._grad_accum = grads
        self._env_steps_log.append(logs["env_steps"])
        for k2, v in logs.items():
            if k2 != "env_steps":
                self.logs[k2].append(v)
        self.losses.append(logs["loss"])

    def _device_env_tables(self):
        """Device tables for the CURRENT env (the trainer swaps org/aug
        envs mid-training — cache per env object, holding a strong ref
        so ids can't be recycled)."""
        from dasa_tpu.env.device_env import DeviceEnvTables

        cache = getattr(self, "_dev_env_cache", None)
        if cache is None:
            cache = self._dev_env_cache = {}
        key = id(self.env)
        if key not in cache:
            cache[key] = (self.env, DeviceEnvTables.build(
                self.env, self.cfg.max_candidates))
        self._dev_env = cache[key][1]
        return self._dev_env

    def use_device_rollout(self) -> bool:
        """Training rollouts run fully on device when nothing needs the
        host env mid-episode (no back-translation, no visited masking)."""
        if self.cfg.device_rollout == "never" or self.env is None:
            return False
        return not self.cfg.submit and getattr(self.env, "graphs", None) \
            is not None

    def _device_rollout_args(self, feedback: str,
                             train_ml: Optional[float],
                             train_rl: bool, speaker=None):
        """Reset the env to the next minibatch and assemble the fused
        rollout-grad program's inputs (advances the rollout rng).

        `speaker` triggers selfTrain back-translation (agent_dg.py:
        656-675): the minibatch's instructions are replaced by the
        jitted speaker decode BEFORE the fused program runs — the
        episode itself still needs no host mid-episode, so the fast
        path stays fully fused.  The featdrop mask is shared with the
        speaker like the reference (noise drawn even when
        consistent_drop is off, matching the host rollout)."""
        from dasa_tpu.env.device_env import episode_inputs

        cfg = self.cfg
        env = self.env
        env.reset()
        dev = self._device_env_tables()

        base_rng = jax.random.fold_in(self._base_rng,
                                      self._rollout_counter)
        self._rollout_counter += 1
        use_noise = cfg.consistent_drop or speaker is not None
        env_noise = (self._noise_fn()(base_rng) if use_noise
                     else jnp.ones((cfg.feature_size,), self.dtype))
        if speaker is not None:
            speaker.relabel_batch(env, env_noise, base_rng)
        ep = episode_inputs(env, dev)

        instr = self._put_batch(env._static["instr"])
        valid = self._put_batch(~env._static["pad_mask"])
        seq_len = self._put_batch(env._static["seq_len"])
        return (self._put_batch(ep["node0"]), self._put_batch(ep["view0"]),
                self._put_batch(ep["goal"]), self._put_batch(ep["start"]),
                instr, valid, seq_len, base_rng, env_noise,
                jnp.asarray(train_ml if train_ml is not None else 0.0,
                            jnp.float32),
                jnp.asarray(1.0 if train_rl else 0.0, jnp.float32),
                jnp.asarray(0.01 if (train_rl and feedback == "sample")
                            else 0.0, jnp.float32))

    def precompile_device(self, feedbacks=("teacher", "sample")) -> None:
        """Compile the fused rollout-grad programs CONCURRENTLY (one
        thread per program).  XLA compilation releases the GIL and the
        axon remote-compile service accepts independent programs in
        parallel, so this overlaps the two multi-minute compiles that
        otherwise serialize at the first training iteration.

        On single-device runs the compiled executables are additionally
        served from the AOT executable cache (utils/aot_cache.py):
        warm starts deserialize in seconds instead of recompiling
        through the remote service, which the persistent JAX compile
        cache cannot capture."""
        import threading

        from dasa_tpu.utils.aot_cache import enabled as aot_enabled
        from dasa_tpu.utils.aot_cache import load_or_compile

        use_noise = self.cfg.consistent_drop
        use_aot = aot_enabled() and self.mesh is None
        results: Dict[str, Exception] = {}
        # the host env is stateful — build every program's args here,
        # sequentially; only the (thread-safe) jit dispatch runs in
        # parallel.  Snapshot the env cursor and rollout rng counter so
        # the warmup dispatches do not shift the training data/noise
        # stream versus a non-precompiled run (the snapshot is exact as
        # long as the warmup doesn't wrap the epoch, which would
        # reshuffle the underlying item order).
        env_ix0 = self.env.ix
        counter0 = self._rollout_counter
        combined = self.use_combined_rollout()
        if combined:
            # fuse_passes: the training loop dispatches ONE 2B-wide
            # program per accumulate pair instead of the two split ones
            feedbacks = ("combined",)
            prebuilt = {"combined": self._device_combined_args(
                "sample", self.cfg.ml_weight or 0.2, True)}
        else:
            prebuilt = {fb: self._device_rollout_args(
                fb, 0.2 if fb == "teacher" else None, fb == "sample")
                for fb in feedbacks}
        self.env.ix = env_ix0
        self._rollout_counter = counter0
        cfg_key = self.cfg.to_json()

        def compile_one(fb):
            try:
                env_arrays = self._dev_env.arrays()
                if fb == "combined":  # fused teacher+sample pair
                    t_len = self._teacher_len()
                    key = ("devcomb", "sample", use_noise, False,
                           t_len)
                    fn = self._device_combined_grad_fn(
                        "sample", use_noise, False)
                    args = (self.params, self.tables, env_arrays,
                            *prebuilt[fb])
                elif fb == "teacher":  # runs first in an iteration
                    t_len = self._teacher_len()
                    key = ("devgrad", fb, use_noise, t_len)
                    fn = self._device_grad_fn(fb, use_noise)
                    args = (self.params, self.tables, env_arrays,
                            *prebuilt[fb])
                else:  # later passes accumulate inside the program
                    key = ("devgradacc", fb, use_noise, 0)
                    fn = self._device_grad_acc_fn(fb, use_noise)
                    zero = jax.tree_util.tree_map(
                        jnp.zeros_like, self.params["params"])
                    args = (self.params, self.tables, env_arrays, zero,
                            *prebuilt[fb])
                if use_aot:
                    # install the AOT executable so training dispatches
                    # call it directly (no jit-cache recompile)
                    self._jit_cache[key] = load_or_compile(
                        f"{key[0]}_{fb}", fn, args,
                        extra_key=f"{cfg_key}|{key}")
                else:  # warm by dispatch; gradients are discarded
                    grads, logs = fn(*args)
                    jax.block_until_ready(logs["loss"])
            except Exception as e:  # surface in the caller thread
                results[fb] = e

        threads = [threading.Thread(target=compile_one, args=(fb,))
                   for fb in feedbacks]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for fb, err in results.items():
            raise RuntimeError(f"precompile({fb}) failed") from err
        if use_aot and "apply" not in self._jit_cache:
            zero = jax.tree_util.tree_map(jnp.zeros_like,
                                          self.params["params"])
            self._jit_cache["apply"] = load_or_compile(
                "apply", self._apply_fn(), (self.params, self.opt_state,
                                            zero), extra_key=cfg_key)

    def device_rollout(self, train_ml: Optional[float] = None,
                       train_rl: bool = True,
                       feedback: Optional[str] = None,
                       speaker=None) -> None:
        """One training episode batch, fully on device: dispatches a
        single fused act+grad program and accumulates its gradients;
        fetches nothing.  `speaker` relabels the batch first
        (selfTrain back-translation, agent_dg.py:656-675)."""
        cfg = self.cfg
        feedback = feedback or self.feedback
        train_rl = train_rl and feedback == "sample"
        use_noise = cfg.consistent_drop or speaker is not None
        args = self._device_rollout_args(feedback, train_ml, train_rl,
                                         speaker=speaker)
        if self._grad_accum is None:
            grads, logs = self._device_grad_fn(feedback, use_noise)(
                self.params, self.tables, self._dev_env.arrays(), *args)
        else:  # accumulate inside the program (no tree-add dispatch)
            grads, logs = self._device_grad_acc_fn(feedback, use_noise)(
                self.params, self.tables, self._dev_env.arrays(),
                self._grad_accum, *args)
        self._grad_accum = grads
        self._env_steps_log.append(logs["env_steps"])
        for k2, v in logs.items():
            if k2 != "env_steps":
                self.logs[k2].append(v)
        self.losses.append(logs["loss"])

    def env_steps_total(self) -> int:
        """Total (episode, step) pairs processed, combining the host
        counter with the lazily accumulated device-rollout counts (this
        call fetches device values — use outside timed regions)."""
        dev = sum(int(x) for x in self._env_steps_log)
        return self.total_env_steps + dev

    def _apply_fn(self):
        if "apply" not in self._jit_cache:

            # donation: params/opt_state/grads buffers are dead after
            # the update, so XLA updates in place (no ~1 GB of copies)
            @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
            def run(params, opt_state, grads):
                updates, opt_state = self.tx.update(
                    grads, opt_state, params["params"])
                new_inner = optax.apply_updates(params["params"], updates)
                return {**params, "params": new_inner}, opt_state

            self._jit_cache["apply"] = run
        return self._jit_cache["apply"]

    def _tree_add_fn(self):
        if "tree_add" not in self._jit_cache:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(a, b):
                return jax.tree_util.tree_map(jnp.add, a, b)

            self._jit_cache["tree_add"] = run
        return self._jit_cache["tree_add"]

    def precompile_replay(self, batch_size: int,
                          feedbacks=("teacher", "sample"),
                          buckets=None, pairs: bool = False) -> None:
        """Trace+compile every replay-grad variant up front (one-time;
        the persistent compile cache makes later processes instant).
        Without this, a new episode-length bucket pays minutes of XLA
        compilation in the middle of training."""
        cfg = self.cfg
        if buckets is None:
            buckets = sorted({min(8, self.episode_len), self.episode_len})
        use_noise = cfg.consistent_drop or cfg.self_train
        b, k, L = batch_size, cfg.max_candidates, cfg.max_input
        instr = jnp.ones((b, L), jnp.int32)
        valid = jnp.ones((b, L), bool)
        seq_len = jnp.full((b,), L, jnp.int32)
        env_noise = self._noise_fn()(self._base_rng)

        def dummy_sobs(t_steps=None):
            shape = (b,) if t_steps is None else (t_steps, b)
            kshape = shape + (k,)
            return {
                "feat_row": jnp.zeros(shape, jnp.int32),
                "view_index": jnp.zeros(shape, jnp.int32),
                "heading": jnp.zeros(shape, jnp.float32),
                "elevation": jnp.zeros(shape, jnp.float32),
                "cand_point_id": jnp.zeros(kshape, jnp.int32),
                "cand_heading": jnp.zeros(kshape, jnp.float32),
                "cand_elevation": jnp.zeros(kshape, jnp.float32),
                "cand_n": jnp.ones(shape, jnp.int32),
                "teacher": jnp.zeros(shape, jnp.int32),
                "back_teacher": jnp.zeros(shape, jnp.int32),
                "logit_mask": jnp.zeros(kshape, bool),
                "active": jnp.ones(shape, bool),
                "is_first": jnp.zeros(shape, bool),
                "action": jnp.zeros(shape, jnp.int32),
            }

        def args_for(t):
            return (instr, valid, seq_len, dummy_sobs(t), dummy_sobs(),
                    jnp.zeros((t, b), jnp.float32),
                    jnp.zeros((t, b), jnp.float32),
                    jnp.ones((b,), bool), jnp.zeros((b,), jnp.float32),
                    self._base_rng, env_noise,
                    jnp.asarray(0.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))

        for t in buckets:
            grads, logs = self._grad_fn(use_noise, t)(
                self.params, self.tables,
                *self._put_replay_args(args_for(t)))
            jax.block_until_ready(logs["loss"])
        if pairs:
            t = min(8, self.episode_len)
            pair_args = tuple(
                jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), a)
                for a in args_for(t))
            grads, logs = self._grad_pair_fn(use_noise, t)(
                self.params, self.tables, *pair_args)
            jax.block_until_ready(logs["loss"])

    # ------------------------------------------------------------------
    # rollout
    # ------------------------------------------------------------------
    def _to_sobs(self, obs: Obs, ended: np.ndarray, visited_mask,
                 is_first: bool) -> dict:
        k = obs.cand_point_id.shape[1]
        slots = np.arange(k)[None, :]
        logit_mask = slots > obs.cand_n[:, None]
        if visited_mask is not None:
            logit_mask = logit_mask | visited_mask
        return {
            "feat_row": obs.feat_row,
            "view_index": obs.view_index,
            "heading": obs.heading,
            "elevation": obs.elevation,
            "cand_point_id": obs.cand_point_id,
            "cand_heading": obs.cand_heading,
            "cand_elevation": obs.cand_elevation,
            "cand_n": obs.cand_n,
            "teacher": obs.teacher,
            "back_teacher": obs.back_teacher,
            "logit_mask": logit_mask,
            "active": ~ended,
            "is_first": np.full(obs.batch_size(), is_first, bool),
            "action": np.zeros(obs.batch_size(), np.int32),  # filled later
        }

    def rollout(self, train_ml: Optional[float] = None,
                train_rl: bool = True, reset: bool = True,
                speaker=None, feedback: Optional[str] = None,
                defer_grad: bool = False):
        """One episode batch.  In train mode (train_ml/train_rl set),
        accumulates gradients into self._grad_accum; always returns the
        trajectories (reference contract: agent_dg.py:633-1033)."""
        cfg = self.cfg
        feedback = feedback or self.feedback
        # teacher/argmax feedback never trains RL (agent_dg.py:643-644)
        train_rl = train_rl and feedback == "sample"
        training = (train_ml is not None) or train_rl

        env = self.env
        obs = env.reset() if reset else env._get_obs()
        batch_size = obs.batch_size()

        base_rng = jax.random.fold_in(self._base_rng, self._rollout_counter)
        self._rollout_counter += 1

        # the reference draws env-drop noise through an nn.Dropout, so at
        # eval (decoder.eval()) the mask is all-ones (agent_dg.py:657,
        # 677) — gate on `training`, not just the config flag
        use_noise = (training and cfg.consistent_drop) or (
            speaker is not None)
        env_noise = self._noise_fn()(base_rng) if use_noise else jnp.ones(
            (cfg.feature_size,), self.dtype)
        if self.mesh is not None:
            env_noise = self._put_replicated(env_noise)

        if speaker is not None:
            obs = self._back_translate(speaker, env, env_noise, base_rng)

        instr = self._put_batch(obs.instr)
        valid = self._put_batch(~obs.pad_mask)
        seq_len = self._put_batch(obs.seq_len)
        # progress-monitor target: the episode-start progress, captured
        # once like the reference's _sort_batch (agent_dg.py:683)
        pm_target = obs.progress.astype(np.float32).copy()
        cached = (None if feedback == "teacher" else
                  self._encode_fn(training)(
                      self.params, instr, valid, seq_len, base_rng))

        trajs = [[t] for t in env.state_tuples()]
        instr_ids = env.instr_ids()
        ended = np.zeros(batch_size, bool)
        last_dist = obs.distance.copy()
        # node-index visited sets; the current node is added at each step
        # before masking (agent_dg.py:836-841)
        visited = ([set() for _ in range(batch_size)]
                   if cfg.submit else None)

        dec_h = decoder_state_width(cfg)
        state = self._put_batch(DecoderState(
            h=np.zeros((batch_size, dec_h), np.float32),
            c=np.zeros((batch_size, dec_h), np.float32),
            h1=np.zeros((batch_size, dec_h), np.float32)))
        state = jax.tree_util.tree_map(
            lambda x: x.astype(self.dtype), state)
        # teacher-forced rollouts are fully determined by the env's
        # shortest-path teacher: the policy forward only matters in the
        # replay, so the act loop needs zero device round-trips
        teacher_only = feedback == "teacher"
        act = (None if teacher_only
               else self._act_fn(feedback, training, use_noise))

        records: List[dict] = []
        rewards: List[np.ndarray] = []
        rl_masks: List[np.ndarray] = []

        for t in range(self.episode_len):
            visited_mask = None
            if cfg.submit:
                nodes = env.current_nodes()
                visited_mask = np.zeros_like(obs.cand_point_id, bool)
                for i in range(batch_size):
                    visited[i].add(int(nodes[i]))
                    visited_mask[i] = np.isin(
                        obs.cand_nbr_ix[i], list(visited[i]))
            sobs = self._to_sobs(obs, ended, visited_mask, t == 0)
            if teacher_only:
                a = sobs["teacher"]
            else:
                sobs_dev = self._put_batch(sobs)
                state, action = act(self.params, self.tables, cached,
                                    valid, seq_len, state, sobs_dev, t,
                                    base_rng, env_noise)
                a = np.asarray(action)
            # STOP (slot == cand_n) or already ended -> -1 env action
            a_env = np.where((a >= obs.cand_n) | ended, -1, a)
            sobs["action"] = np.where(a > obs.cand_n, obs.cand_n,
                                      a).astype(np.int32)
            records.append(sobs)

            obs = env.step(a_env, trajs)

            reward = np.zeros(batch_size, np.float32)
            mask = np.ones(batch_size, np.float32)
            dist = obs.distance
            for i in range(batch_size):
                if ended[i]:
                    reward[i] = 0.0
                    mask[i] = 0.0
                elif a_env[i] == -1:
                    reward[i] = 2.0 if dist[i] < 3.0 else -2.0
                else:
                    delta = -(dist[i] - last_dist[i])
                    reward[i] = 1.0 if delta > 0 else (
                        -1.0 if delta < 0 else 0.0)
            rewards.append(reward)
            rl_masks.append(mask)
            last_dist = dist.copy()
            self.total_env_steps += int((~ended).sum())
            ended = ended | (a_env == -1)
            if ended.all():
                break

        for i, (iid, tr) in enumerate(zip(instr_ids, trajs)):
            self.results[iid] = {"instr_id": iid, "trajectory": tr}

        if training:
            # pad T to buckets of 8 (capped at max_action): bounded set
            # of compiled replay variants — precompile_replay() +
            # the persistent compile cache absorb the one-time cost, and
            # short teacher rollouts avoid paying 35 steps of FLOPs.
            # Padded steps are inert (active=False, rl_mask=0, reward=0)
            # and only exist when all episodes have ended, so the A2C
            # bootstrap through them is exactly zero.
            bucket = min(8, self.episode_len)
            n_steps = (bucket if len(records) <= bucket
                       else self.episode_len)
            while len(records) < n_steps:
                pad = {k: v.copy() for k, v in records[-1].items()}
                pad["active"] = np.zeros_like(pad["active"])
                pad["is_first"] = np.zeros_like(pad["is_first"])
                records.append(pad)
                rewards.append(np.zeros(batch_size, np.float32))
                rl_masks.append(np.zeros(batch_size, np.float32))
            stacked = {
                k: np.stack([r[k] for r in records])
                for k in records[0]
            }
            final_sobs = self._to_sobs(obs, ended, None, False)
            replay = {
                "use_noise": use_noise,
                "n_steps": n_steps,
                "args": (instr, valid, seq_len, stacked, final_sobs,
                         np.stack(rewards), np.stack(rl_masks), ended,
                         pm_target, base_rng, env_noise,
                         np.float32(train_ml if train_ml is not None
                                    else 0.0),
                         np.float32(1.0 if train_rl else 0.0),
                         np.float32(0.01 if (train_rl
                                             and feedback == "sample")
                                    else 0.0)),
            }
            if defer_grad:
                self._pending_replays.append(replay)
            else:
                self._run_replays([replay])

        return [{"instr_id": iid, "path": tr}
                for iid, tr in zip(instr_ids, trajs)]

    def _back_translate(self, speaker, env, env_noise, base_rng):
        """Speaker back-translation: replace batch instructions with
        speaker-generated ones (vl_rollout, agent_dg.py:656-675)."""
        return speaker.relabel_batch(env, env_noise, base_rng)

    def _run_replays(self, replays: List[dict]) -> None:
        """Dispatch replay grads; two compatible replays (same length
        bucket/noise mode) fuse into one vmapped program."""
        while replays:
            a = replays.pop(0)
            paired = None
            if self.mesh is None:  # pair-fusion is a single-device path
                for i, b in enumerate(replays):
                    if (b["n_steps"] == a["n_steps"]
                            and b["use_noise"] == a["use_noise"]):
                        paired = replays.pop(i)
                        break
            if paired is not None:
                args = tuple(
                    jax.tree_util.tree_map(
                        lambda x, y: jnp.stack(
                            [jnp.asarray(x), jnp.asarray(y)]), xa, ya)
                    for xa, ya in zip(a["args"], paired["args"]))
                grads, logs = self._grad_pair_fn(
                    a["use_noise"], a["n_steps"])(
                    self.params, self.tables, *args)
                log_slices = [
                    jax.tree_util.tree_map(lambda x: x[i], logs)
                    for i in range(2)]
            else:
                args = self._put_replay_args(a["args"])
                grads, logs = self._grad_fn(a["use_noise"],
                                            a["n_steps"])(
                    self.params, self.tables, *args)
                log_slices = [logs]
            if self._grad_accum is None:
                self._grad_accum = grads
            else:
                # one fused donated program instead of one dispatch per
                # parameter leaf
                self._grad_accum = self._tree_add_fn()(
                    self._grad_accum, grads)
            # keep logs as device scalars: forcing them here would sync
            # and serialize the (async) replay against the next
            # rollout's act phase
            for logs_i in log_slices:
                for k, v in logs_i.items():
                    self.logs[k].append(v)
                self.losses.append(logs_i["loss"])

    def flush_replays(self) -> None:
        if self._pending_replays:
            pending, self._pending_replays = self._pending_replays, []
            self._run_replays(pending)

    # ------------------------------------------------------------------
    # training drivers (reference: agent_dg.py:1327-1464)
    # ------------------------------------------------------------------
    def zero_grad(self):
        self._grad_accum = None
        self._pending_replays = []
        self.losses = []

    def accumulate_gradient(self, feedback: str = "teacher",
                            ml_weight: Optional[float] = None, **kwargs):
        """Two-pass gradient accumulation (teacher-ML + sampled-RL,
        agent_dg.py:1347-1384).  `ml_weight` overrides cfg.ml_weight so
        the aug-alternation scheme can pass ml_weight_org/aug per env
        instead of mutating global args (train.py:233-243).

        When nothing needs the host env mid-episode, each pass runs as
        ONE fused on-device act+grad program (device_rollout)."""
        cfg = self.cfg
        if ml_weight is None:
            ml_weight = cfg.ml_weight
        speaker = kwargs.pop("speaker", None)
        defer = kwargs.pop("defer_pairs", False)
        # selfTrain back-translation runs on the fused device paths too
        # (the speaker relabels BEFORE the episode; nothing needs the
        # host mid-episode) — only the streamed regime falls back to
        # the host rollout, since its slots refill mid-window.
        if (not kwargs and not defer and self.use_device_rollout()
                and not (speaker is not None
                         and self.use_stream_rollout())):
            if feedback == "teacher":
                self.device_rollout(train_ml=cfg.teacher_weight,
                                    train_rl=False, feedback="teacher",
                                    speaker=speaker)
            elif feedback == "sample":
                if self.use_stream_rollout():
                    # continuous batching: one streamed window replaces
                    # the accumulate pair (agents/stream.py)
                    self.device_rollout_stream(ml_weight,
                                               feedback="sample")
                elif self.use_combined_rollout() and ml_weight:
                    # both passes as ONE 2B-wide program: the teacher
                    # half rides the sampled scan's weight reads for
                    # free (BENCH_NOTES.md round-3 batch-width probe)
                    self.device_rollout_combined(ml_weight,
                                                 feedback="sample",
                                                 speaker=speaker)
                else:
                    self.device_rollout(train_ml=ml_weight,
                                        train_rl=False,
                                        feedback="teacher",
                                        speaker=speaker)
                    self.device_rollout(train_ml=None, train_rl=True,
                                        feedback="sample",
                                        speaker=speaker)
            else:
                raise ValueError(feedback)
            return
        if speaker is not None:
            kwargs["speaker"] = speaker
        if feedback == "teacher":
            self.feedback = "teacher"
            self.rollout(train_ml=cfg.teacher_weight, train_rl=False,
                         feedback="teacher", **kwargs)
        elif feedback == "sample":
            # separate dispatches: the vmapped pair program measured 3x
            # slower on v5e (remat-scan under vmap lowers poorly); pass
            # defer_pairs=True to accumulate_gradient to re-enable it
            self.feedback = "teacher"
            self.rollout(train_ml=ml_weight, train_rl=False,
                         feedback="teacher", defer_grad=defer, **kwargs)
            self.feedback = "sample"
            self.rollout(train_ml=None, train_rl=True, feedback="sample",
                         defer_grad=defer, **kwargs)
            self.flush_replays()
        else:
            raise ValueError(feedback)

    def optim_step(self):
        self.flush_replays()
        if self._grad_accum is None:
            return
        self.params, self.opt_state = self._apply_fn()(
            self.params, self.opt_state, self._grad_accum)
        self._grad_accum = None
        self.iter_count += 1

    def train(self, n_iters: int, feedback: str = "teacher", **kwargs):
        for _ in range(n_iters):
            self.zero_grad()
            if feedback == "teacher":
                self.accumulate_gradient("teacher", **kwargs)
            elif feedback == "sample":
                if not kwargs and self.use_stream_rollout():
                    self.device_rollout_stream(self.cfg.ml_weight,
                                               feedback="sample")
                elif not kwargs and self.use_device_rollout():
                    if self.cfg.ml_weight != 0:
                        self.device_rollout(train_ml=self.cfg.ml_weight,
                                            train_rl=False,
                                            feedback="teacher")
                    self.device_rollout(train_ml=None, train_rl=True,
                                        feedback="sample")
                else:
                    if self.cfg.ml_weight != 0:
                        self.rollout(train_ml=self.cfg.ml_weight,
                                     train_rl=False, feedback="teacher",
                                     **kwargs)
                    self.rollout(train_ml=None, train_rl=True,
                                 feedback="sample", **kwargs)
            else:
                raise ValueError(feedback)
            self.optim_step()

    # ------------------------------------------------------------------
    # device-resident evaluation: the whole argmax episode (policy,
    # transitions) runs as ONE jitted program per batch; the host fetches
    # the (T, B) node/view/action record once and rebuilds the
    # trajectories — instead of 2 device round-trips per step
    # ------------------------------------------------------------------
    def _device_eval_fn(self):
        from dasa_tpu.env.device_env import device_obs, device_transition

        key = "deveval"
        if key not in self._jit_cache:
            cfg = self.cfg
            policy = self.policy
            T = cfg.max_action
            k = cfg.max_candidates

            @jax.jit
            def run(params, tables, env_arrays, node0, view0, goal,
                    start, instr, valid, seq_len):
                cached = policy.apply(params, instr, valid, seq_len,
                                      deterministic=True,
                                      method=DasaPolicy.encode_text)
                batch = instr.shape[0]
                dist_t, node_base_t = env_arrays[6], env_arrays[8]
                goal_local = goal - node_base_t[goal]
                total_dist = dist_t[node0, goal_local]
                dec_h = decoder_state_width(cfg)
                state0 = DecoderState(
                    h=jnp.zeros((batch, dec_h), self.dtype),
                    c=jnp.zeros((batch, dec_h), self.dtype),
                    h1=jnp.zeros((batch, dec_h), self.dtype))

                def model_act(sobs, state):
                    inputs = make_step_inputs(cfg, tables, sobs)
                    percept = policy.apply(
                        params, cached, valid, seq_len, inputs,
                        deterministic=True, is_test=True,
                        lstm_pallas=self._lstm_pallas,
                        method=DasaPolicy.percept_step)
                    new_state, logit, _v, _aux = policy.apply(
                        params, percept, valid, state, sobs["is_first"],
                        deterministic=True,
                        method=DasaPolicy.decode_from_percept)
                    masked = jnp.where(sobs["logit_mask"], NEG_INF,
                                       logit.astype(jnp.float32))
                    return new_state, jnp.argmax(masked,
                                                 axis=-1).astype(jnp.int32)

                def step(carry, t):
                    node, view, ended, state = carry
                    sobs = device_obs(env_arrays, node, view, goal,
                                      start, total_dist, k)
                    sobs["is_first"] = jnp.broadcast_to(t == 0, (batch,))
                    new_state, a = jax.lax.cond(
                        ended.all(),
                        lambda s, st: (
                            st, jnp.full((batch,), k - 1, jnp.int32)),
                        model_act, sobs, state)
                    rec = {"node": node, "view": view, "action": a,
                           "active": ~ended,
                           "stop": (a >= sobs["cand_n"]) & ~ended}
                    node, view, stop = device_transition(
                        env_arrays, node, view, a, ended)
                    return (node, view, ended | stop, new_state), rec

                carry0 = (node0, view0, jnp.zeros((batch,), bool), state0)
                (node_f, view_f, _e, _s), recs = jax.lax.scan(
                    step, carry0, jnp.arange(T, dtype=jnp.int32))
                recs["final_node"] = node_f
                recs["final_view"] = view_f
                return recs

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _device_test_batch(self) -> None:
        """Evaluate one env minibatch on device and record results."""
        from dasa_tpu.env.device_env import episode_inputs

        env = self.env
        env.reset()
        dev = self._device_env_tables()
        ep = episode_inputs(env, dev)
        instr = self._put_batch(env._static["instr"])
        valid = self._put_batch(~env._static["pad_mask"])
        seq_len = self._put_batch(env._static["seq_len"])
        recs = self._device_eval_fn()(
            self.params, self.tables, dev.arrays(),
            self._put_batch(ep["node0"]), self._put_batch(ep["view0"]),
            self._put_batch(ep["goal"]), self._put_batch(ep["start"]),
            instr, valid, seq_len)
        recs = jax.tree_util.tree_map(np.asarray, recs)  # ONE sync
        from dasa_tpu.sim.engine import micro_trajectory

        nodes, views = recs["node"], recs["view"]
        actions, stops = recs["action"], recs["stop"]
        actives = recs["active"]
        T = nodes.shape[0]
        ids_of = {}
        for item in env.batch:
            g = env.graphs[item["scan"]]
            ids_of[item["scan"]] = (g.ids, dev.base[item["scan"]])
        for i, item in enumerate(env.batch):
            gids, base = ids_of[item["scan"]]
            self.total_env_steps += int(actives[:, i].sum())

            def vp(global_node):
                return gids[int(global_node) - base]

            def angles(view):
                return ((int(view) % 12) * (np.pi / 6),
                        (int(view) // 12 - 1) * (np.pi / 6))

            tr = [(vp(nodes[0, i]), *angles(views[0, i]))]
            for t in range(T):
                if not actives[t, i] or stops[t, i]:
                    break
                nxt = nodes[t + 1, i] if t + 1 < T else recs["final_node"][i]
                nxt_view = (views[t + 1, i] if t + 1 < T
                            else recs["final_view"][i])
                micro_trajectory(vp(nodes[t, i]), int(views[t, i]),
                                 int(nxt_view), tr)
                tr.append((vp(nxt), *angles(nxt_view)))
            iid = item["instr_id"]
            self.results[iid] = {"instr_id": iid, "trajectory": tr}

    def test(self, use_dropout: bool = False, feedback: str = "argmax",
             iters: Optional[int] = None):
        """Loop rollouts until the dataset wraps (BaseAgent.test,
        agent_dg.py:58-100)."""
        self.feedback = feedback
        self.results = {}
        env = self.env
        env.reset_epoch(shuffle=iters is not None)
        device_eval = (feedback == "argmax" and not use_dropout
                       and iters is None and not self.cfg.submit
                       and self.use_device_rollout())
        if iters is not None:
            for _ in range(iters):
                self.rollout(train_ml=None, train_rl=False,
                             feedback=feedback)
        elif device_eval and self.use_stream_rollout():
            # streamed eval: the split flows through persistent slots
            # at full utilization (agents/stream.py)
            self.stream_test_loop()
        else:
            max_batches = env.size() // env.batch_size + 2
            for _ in range(max_batches):
                if device_eval:
                    self._device_test_batch()
                else:
                    self.rollout(train_ml=None, train_rl=False,
                                 feedback=feedback)
                if len(self.results) >= env.size():
                    break
        return list(self.results.values())

    def get_results(self) -> List[dict]:
        """Reference API parity (BaseAgent.get_results)."""
        return list(self.results.values())

    # ------------------------------------------------------------------
    def save(self, epoch: int, path: str):
        """Component-keyed msgpack checkpoint (encoder/decoder/critic/
        adain sub-trees addressable individually), replacing the
        monolithic flax-bytes pickle.  Reference format: per-component
        state dicts (agent_dg.py:1466-1487)."""
        from dasa_tpu.parallel.distributed import is_primary

        if not is_primary():  # rank-0-only checkpoints (DDP parity:
            return            # nav_dic_pretrain.py:868-888)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        state = serialization.to_state_dict(self.params)
        blob = {
            "epoch": epoch,
            "params": jax.tree_util.tree_map(np.asarray, state["params"]),
            "opt_state": jax.tree_util.tree_map(
                np.asarray, serialization.to_state_dict(self.opt_state)),
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(blob))

    @staticmethod
    def _flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(Seq2SeqAgent._flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = v
        return out

    def load(self, path: str) -> int:
        """Mismatch-tolerant load: every current parameter leaf whose
        path+shape matches the checkpoint is restored; missing/extra/
        reshaped leaves keep their init values with a NOTICE, matching
        the reference's tolerant per-component recover_state
        (agent_dg.py:1489-1510)."""
        with open(path, "rb") as f:
            raw = f.read()
        try:
            blob = serialization.msgpack_restore(raw)
        except Exception:
            # round-1 legacy format: pickled flax-bytes blob
            blob = pickle.loads(raw)
            self.params = serialization.from_bytes(self.params,
                                                   blob["params"])
            if self.cfg.load_optim:
                self.opt_state = serialization.from_bytes(
                    self.opt_state, blob["opt_state"])
            return blob["epoch"]

        cur_state = serialization.to_state_dict(self.params)
        flat_cur = self._flatten(cur_state["params"])
        flat_new = self._flatten(blob["params"])
        merged = {}
        skipped = []
        for key, val in flat_cur.items():
            cand = flat_new.get(key)
            if cand is not None and np.shape(cand) == np.shape(val):
                merged[key] = cand
            else:
                merged[key] = val
                skipped.append("/".join(key))
        unused = [k for k in flat_new if k not in flat_cur]
        if skipped or unused:
            print("NOTICE: DIFFERENT KEYS IN THE LISTENER "
                  f"(kept init for {len(skipped)}: {skipped[:5]}...; "
                  f"ignored {len(unused)} checkpoint-only keys)",
                  flush=True)
        nested: dict = {}
        for key, val in merged.items():
            node = nested
            for part in key[:-1]:
                node = node.setdefault(part, {})
            node[key[-1]] = val
        self.params = serialization.from_state_dict(
            self.params, {**cur_state, "params": nested})
        if self.cfg.load_optim and blob.get("opt_state") is not None:
            try:
                self.opt_state = serialization.from_state_dict(
                    self.opt_state, blob["opt_state"])
            except Exception as e:  # optimizer shape drift: keep fresh
                print(f"NOTICE: optimizer state not restored ({e})",
                      flush=True)
        if self.mesh is not None:
            from dasa_tpu.parallel import replicate

            self.params = replicate(self.params, self.mesh)
            self.opt_state = replicate(self.opt_state, self.mesh)
        return int(blob["epoch"])
