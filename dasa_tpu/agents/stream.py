"""Streaming rollouts: continuous batching for the training pass.

The fused episodic programs (seq2seq.py::_make_device_fused_loss_fn)
scan to the batch's max episode length, so every row that ends early is
a masked MXU row until the scan (or its packed tail) narrows.  The
round-3 batch-width probe measured steps as the expensive axis and
width as nearly free — which means the waste is structural: at the
headline config a 2B-wide scan step costs the same whether 40 or 12
rows are still alive.

This module keeps every row alive instead.  One optimizer window =
`stream_steps` scan steps over 2B persistent slots (teacher-ML half,
sampled-RL half, mirroring the combined program's layout).  The moment
a slot's episode ends, the NEXT scan step refills it with a fresh
episode from an on-device staging pool; episodes still mid-flight when
the window closes carry their full state (graph position, decoder
LSTM state, per-episode env-drop mask, step budget) into the next
window and continue there.

Correctness contract (tests/test_stream.py):
- Trajectories are unchanged: a streamed episode takes exactly the
  actions its standalone rollout takes (slot refills re-initialize the
  decoder through the same ``is_first`` blend every episode start uses,
  models/policy.py:432-437, so an episode cannot see its predecessor).
- Returns are unchanged: A2C discounted returns never cross episode
  boundaries (`stream_returns` cuts at terminals), and an episode
  crossing a window edge bootstraps with the critic's value — the SAME
  mechanism the reference applies at its maxAction truncation
  (agent_dg.py:962-981), applied at the window edge.  Episodes hitting
  maxAction inside a window get the reference truncation exactly: one
  bookkeeping step records the critic bootstrap, then the slot refills.
- Data is exact: every staged episode is consumed exactly once.  The
  host streams fresh episodes through fixed-shape chunks; the program
  reports (admitted, consumed, leftover) counts per window, and the
  host re-queues any chunk tail the device-side pool had no room for.
  Flow control runs on lagged counts (the host reads window k's counts
  while k+2 executes), so the training loop never blocks on a fetch.

What changes vs the episodic regime — documented, not hidden: the
optimizer-step granularity (one update per window instead of per 2B
episodes), the teacher:sample episode ratio (slots refill at a rate
inversely proportional to each half's mean episode length), and the
noise stream (per-window dropout salts).  `rollout_mode` is a
throughput knob, like `fuse_passes` — not a bitwise-reproducibility
one.

Data parallel: under a mesh the window runs as a shard_map over the
data axis — each device scans its OWN slot shard against its OWN pool
shard (device-major slot layout, no cross-device gathers on the hot
path), loss denominators and grads ride one psum each, and the host
ledger gains a device axis (every counter is (D, 2)).  Episode
semantics are shard-local, so the single-device correctness contract
holds per shard verbatim (tests/test_stream.py mesh case).

Reference hot loop being replaced: agent_dg.py:633-1033 (rollout) +
train.py:233-243 (the per-minibatch update structure).
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Raw per-episode fields staged through the pool (host -> device) and
# carried across windows.  Shapes per row: instr (L,) i32, valid (L,)
# bool, seq_len () i32, the rest () i32 global node/view ids.  uid is a
# host-assigned episode id (-1 for the template placeholder) carried so
# recorded slot-time trajectories map back to their episodes
# (tests/test_stream.py's consumed-exactly-once and trajectory checks).
RAW_FIELDS = ("instr", "valid", "seq_len", "node0", "view0", "goal",
              "start", "uid")


def stream_returns(rewards, values, done, trunc, real, g_init,
                   gamma: float):
    """Per-step A2C returns over a streamed (S, W) slot-time grid.

    Episodes are laid out back-to-back in each slot column; the reverse
    recurrence cuts at boundaries instead of assuming one episode per
    column (the episodic programs' rev_step, seq2seq.py:1029-1050):

    - ``done[t]``  — terminal STOP at t: G_t = r_t (no successor).
    - ``trunc[t]`` — bookkeeping row holding the critic bootstrap for a
      maxAction-truncated episode: the step before it sees
      G = r + gamma * v_t, exactly the reference's truncation bootstrap
      (agent_dg.py:962-981).
    - ``real[t]``  — rows that advanced an episode; dead/starved rows
      pass the accumulator through untouched.
    - ``g_init``   — window-edge bootstrap: the critic's value for
      slots still mid-flight at the last step, 0 elsewhere.

    Pure function of recorded arrays so the cut logic is unit-testable
    against a per-episode numpy oracle (tests/test_stream.py).
    """
    def rev(g, xs):
        r, v, d, tr, re = xs
        g_next = jnp.where(d, 0.0, g)
        G = r + gamma * g_next
        g2 = jnp.where(tr, v, jnp.where(re, G, g))
        return g2, G

    _, G = jax.lax.scan(rev, g_init, (rewards, values, done, trunc,
                                      real), reverse=True)
    return G


class StreamGeom:
    """Static geometry of the stream program (compile-time).  B/E are
    PER-DEVICE: under a data mesh each device runs the same window body
    over its own slot shard and pool shard (shard_map), so the global
    widths are D x the per-device ones.  Slot layout is device-major:
    global slot d*2B+j is device d's slot j, teacher for j < B."""

    def __init__(self, batch: int, steps: int, pool: int,
                 n_data: int = 1):
        self.B = batch          # slots per half per device
        self.W = 2 * batch      # teacher half [0,B), sample half [B,2B)
        self.S = steps          # scan steps per optimizer window
        self.E = pool           # pool region capacity per half per dev
        self.D = n_data         # data-mesh size (1 = single device)

    @property
    def W_glob(self) -> int:
        return self.D * self.W

    @property
    def E_glob(self) -> int:
        return self.D * self.E

    def key(self) -> Tuple[int, int, int, int]:
        return (self.B, self.S, self.E, self.D)


class _StreamHost:
    """Per-env host state: the device carry, the episode FIFO, and the
    lagged flow-control ledger.  All counters are (D, 2) — device x
    half — since each mesh device runs its own pool shard."""

    def __init__(self, geom: StreamGeom, carry, template: dict,
                 consumed_est: float):
        self.geom = geom
        self.carry = carry
        self.template = template
        self.fifo: deque = deque()
        # (sent[h][d] item lists, flow-log device handles)
        self.inflight: deque = deque()
        D = geom.D
        self.leftover_settled = np.zeros((D, 2), np.int64)
        self.consumed_est = np.full((D, 2), consumed_est)
        self.next_uid = 0
        self.staged: Dict[int, dict] = {}  # uid -> raw episode row
        self.records: List[dict] = []      # per-window record fetches

    def inventory_est(self) -> np.ndarray:
        inv = self.leftover_settled.astype(np.float64)
        for sent, _flow in self.inflight:
            n_sent = np.array([[len(sent[h][d]) for h in (0, 1)]
                               for d in range(self.geom.D)], np.float64)
            inv += n_sent - self.consumed_est
        return np.maximum(inv, 0.0)


class StreamMixin:
    """Streaming-rollout device programs + host staging, mixed into
    Seq2SeqAgent.  Uses only the agent's public machinery: the policy's
    per-step methods, the device env tables, the jit/AOT caches."""

    # ---------------------------------------------------------------
    # host-side wall-time attribution (utils.misc.Timer): phases of the
    # per-window host path, so a bench run can attribute the wall-vs-
    # device-busy gap (BENCH_NOTES.md round-4 MFU cross-check).
    # settle_sync = blocking read of a lagged window's flow counters
    # (device wait, not host work); refill/stage = pure host; dispatch
    # = trace+enqueue of the async window program.
    # ---------------------------------------------------------------
    @property
    def stream_timer(self):
        t = getattr(self, "_stream_timer", None)
        if t is None:
            from dasa_tpu.utils.misc import Timer
            t = self._stream_timer = Timer()
        return t

    # ---------------------------------------------------------------
    # gating and geometry
    # ---------------------------------------------------------------
    def use_stream_rollout(self) -> bool:
        """Streaming needs the device rollout path; under a data mesh
        the batch must split evenly into per-device slot shards."""
        if (self.cfg.rollout_mode != "stream"
                or not self.use_device_rollout()):
            return False
        if self.mesh is not None:
            return self.cfg.batch_size % self.mesh.shape["data"] == 0
        return True

    def _stream_n_data(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape["data"]

    def _stream_geom(self) -> StreamGeom:
        cfg = self.cfg
        D = self._stream_n_data()
        S = cfg.stream_steps or cfg.max_action
        B = cfg.batch_size // D
        if cfg.stream_pool:
            E = -(-cfg.stream_pool // D)
        else:
            E = int(np.ceil(1.3 * B * S
                            / max(self._stream_mean_len(), 2.0)))
        return StreamGeom(B, S, max(E, 2), D)

    def _stream_mean_len(self) -> float:
        """Steady-state episode length estimate: the dataset mean path
        node count (hops + STOP).  Sampled episodes run longer on a
        cold policy (consumption is then LOWER — the pool just carries
        more inventory) and converge toward teacher lengths."""
        if self.env is None or not getattr(self.env, "data", None):
            return float(self.cfg.max_action)
        return float(np.mean([len(it["path"]) for it in self.env.data]))

    # ---------------------------------------------------------------
    # the window program
    # ---------------------------------------------------------------
    def _make_stream_loss_fn(self, feedback: str, use_noise: bool,
                             geom: StreamGeom, record: bool = False,
                             eval_mode: bool = False):
        """One optimizer window: admit fresh episodes into the pool,
        encode every episode text the window can touch, run S scan
        steps with per-step slot refill, bootstrap the edge, and
        assemble the episodic losses over the slot-time grid.

        Returns ``loss_fn(inner_params, tables, env_arrays, carry,
        fresh, fresh_n, base_rng, ml_w, rl_w, ent_w) ->
        (total_loss, (logs, new_carry))``.

        eval_mode: inference semantics — dropout off (deterministic,
        is_test), EVERY slot takes the policy action (no teacher half),
        no env-drop noise; the loss outputs are dead code the jit
        wrapper drops (``_stream_eval_window`` returns logs+carry only,
        so XLA DCEs the critic/CE math).  Used by the streamed test
        loop (device-eval throughput at full slot utilization)."""
        from dasa_tpu.agents.seq2seq import (
            INIT_SALT,
            _entropy,
            make_step_inputs,
            mt_kl_rows,
        )
        from dasa_tpu.env.device_env import device_obs, device_transition
        from dasa_tpu.models import DasaPolicy, DecoderState
        from dasa_tpu.models.layers import NEG_INF

        cfg = self.cfg
        policy = self.policy
        B, W, S, E = geom.B, geom.W, geom.S, geom.E
        T = cfg.max_action
        k = cfg.max_candidates
        keep_p = 1.0 - cfg.featdropout
        is_sample = jnp.arange(W) >= B          # static slot halves
        ml_rows = ~is_sample
        # under a data mesh the body runs per-device inside shard_map:
        # sums that normalize or report globally ride one psum
        mesh_axis = None if geom.D == 1 else "data"

        def allsum(x):
            return jax.lax.psum(x, mesh_axis) if mesh_axis else x

        def loss_fn(inner_params, tables, env_arrays, carry, fresh,
                    fresh_n, base_rng, ml_w, rl_w, ent_w):
            ng = jax.lax.stop_gradient
            inner_params = self._cast_params_once(inner_params)
            params = {"params": inner_params}
            dist_t, node_base_t = env_arrays[6], env_arrays[8]
            if mesh_axis:
                # decorrelate per-device noise/sampling streams (the
                # episodic DP path gets this for free from per-row
                # categorical draws; dropout salts here are per-window)
                base_rng = jax.random.fold_in(
                    base_rng, jax.lax.axis_index(mesh_axis))

            # ---- pool regions: carried leftovers first, then as much
            # of the fresh chunk as fits (the admit clamp; the host
            # re-queues the rest — nothing is dropped)
            pool_n = carry["pool_n"][0]                    # (2,) i32
            adm = jnp.minimum(fresh_n[0], E - pool_n)
            avail = pool_n + adm                           # (2,) i32

            def build_region(h):
                idx = jnp.arange(E)
                from_carry = idx < pool_n[h]
                fi = jnp.clip(idx - pool_n[h], 0, E - 1)
                out = {}
                for f in RAW_FIELDS:
                    c = carry["pool"][f][h]
                    fr = fresh[f][h][fi]
                    m = from_carry.reshape((E,) + (1,) * (c.ndim - 1))
                    out[f] = jnp.where(m, c, fr)
                return out

            region = [build_region(0), build_region(1)]
            # virtual table: [carried slot episodes W][teacher E][sample E]
            table = {f: jnp.concatenate(
                [carry["slot_raw"][f], region[0][f], region[1][f]], 0)
                for f in RAW_FIELDS}
            goal_local_tab = table["goal"] - node_base_t[table["goal"]]
            total_dist_tab = dist_t[table["node0"], goal_local_tab]
            pm_target_tab = 1.0 - total_dist_tab / (total_dist_tab
                                                    + 1e-10)

            # ---- one batched text encode over everything this window
            # can touch; gradients flow to the encoder from every step
            # that runs inside this window (truncated BPTT at edges)
            cached_tab = policy.apply(
                params, table["instr"], table["valid"], table["seq_len"],
                deterministic=eval_mode,
                rngs={"dropout": jax.random.fold_in(base_rng, INIT_SALT)},
                method=DasaPolicy.encode_text)

            def percept_apply(inner, cached_e, valid_e, seqlen_e, inputs,
                              noise_e, drop_rng):
                return policy.apply(
                    {"params": inner}, cached_e, valid_e, seqlen_e,
                    inputs, deterministic=eval_mode, is_test=eval_mode,
                    env_noise=noise_e if use_noise else None,
                    rngs={"dropout": drop_rng},
                    lstm_pallas=self._lstm_pallas,
                    method=DasaPolicy.percept_step)

            if cfg.remat == "percept":
                percept_apply = jax.checkpoint(percept_apply)

            def forward(slot_ep, node, view, state, is_first, noise, t):
                """Per-step policy forward for the slots' CURRENT
                episodes (rng salt structure mirrors the episodic
                programs: 0 percept dropout, 1 decode dropout)."""
                step_rng = jax.random.fold_in(base_rng, t)
                goal_e = table["goal"][slot_ep]
                start_e = table["start"][slot_ep]
                td_e = total_dist_tab[slot_ep]
                valid_e = table["valid"][slot_ep]
                seqlen_e = table["seq_len"][slot_ep]
                cached_e = jax.tree_util.tree_map(
                    lambda x: x[slot_ep], cached_tab)
                sobs = device_obs(env_arrays, node, view, goal_e,
                                  start_e, td_e, k)
                sobs["is_first"] = is_first
                inputs = make_step_inputs(cfg, tables, sobs)
                percept = percept_apply(
                    inner_params, cached_e, valid_e, seqlen_e, inputs,
                    noise[:, None, :], jax.random.fold_in(step_rng, 0))
                new_state, logit, value, aux = policy.apply(
                    params, percept, valid_e, state, is_first,
                    deterministic=eval_mode, already_dropfeat=use_noise,
                    rngs={"dropout": jax.random.fold_in(step_rng, 1)},
                    method=DasaPolicy.decode_from_percept)
                masked = jnp.where(sobs["logit_mask"], NEG_INF,
                                   logit.astype(jnp.float32))
                return sobs, new_state, masked, value, aux, step_rng

            def real_step(sc, t):
                (slot_ep, alive, age, node, view, state, noise,
                 cur) = sc
                step_rng = jax.random.fold_in(base_rng, t)

                # ---- refill dead slots from the pool (per half)
                need = ~alive
                take_h, newix_h, took_n = [], [], []
                for h, rows in ((0, ml_rows), (1, is_sample)):
                    nh = need & rows
                    rank = jnp.cumsum(nh.astype(jnp.int32)) \
                        - nh.astype(jnp.int32)
                    can = cur[h] + rank < avail[h]
                    take_h.append(nh & can)
                    newix_h.append(jnp.clip(W + h * E + cur[h] + rank,
                                            W + h * E,
                                            W + (h + 1) * E - 1))
                    took_n.append((nh & can).sum().astype(jnp.int32))
                take = take_h[0] | take_h[1]
                slot_ep = jnp.where(
                    take, jnp.where(is_sample, newix_h[1], newix_h[0]),
                    slot_ep)
                cur = cur + jnp.stack(took_n)
                starved = (need & ~take).sum().astype(jnp.int32)
                node = jnp.where(take, table["node0"][slot_ep], node)
                view = jnp.where(take, table["view0"][slot_ep], view)
                age = jnp.where(take, 0, age)
                alive = alive | take
                if use_noise:
                    # fresh per-EPISODE env-drop mask on refill (the
                    # episodic per-pass mask, agent_dg.py:731-736, made
                    # per-slot so carried episodes keep theirs)
                    keep = jax.random.bernoulli(
                        jax.random.fold_in(step_rng, 3), keep_p,
                        noise.shape)
                    fresh_rows = keep.astype(noise.dtype) / keep_p
                    noise = jnp.where(take[:, None], fresh_rows, noise)

                # maxAction truncation: one bookkeeping row records the
                # critic bootstrap, then the slot dies and refills
                trunc = alive & (age >= T)
                real = alive & ~trunc

                sobs, new_state, masked, value, aux, _ = forward(
                    slot_ep, node, view, state, take, noise, t)
                logp = jax.nn.log_softmax(masked, axis=-1)
                p = jnp.exp(logp)
                if feedback == "sample":
                    a_pol = jax.random.categorical(
                        jax.random.fold_in(step_rng, 2), masked, axis=-1)
                else:  # argmax (tests/eval-style streams)
                    a_pol = jnp.argmax(masked, axis=-1)
                if eval_mode:  # every slot walks the policy
                    a = a_pol
                else:
                    a = jnp.where(is_sample, a_pol, sobs["teacher"])
                a = ng(a).astype(jnp.int32)
                a_rec = jnp.minimum(a, sobs["cand_n"])
                ce = -jnp.take_along_axis(
                    logp, sobs["teacher"][:, None], axis=1)[:, 0]
                ce = jnp.where(real, ce, 0.0)
                logp_a = jnp.take_along_axis(
                    logp, a_rec[:, None], axis=1)[:, 0]

                # ---- env transition + reward shaping for real rows
                # (agent_dg.py:900-926; trunc/dead rows hold position)
                new_node, new_view, stop = device_transition(
                    env_arrays, node, view, a, ~real)
                goal_local_e = goal_local_tab[slot_ep]
                dist_new = dist_t[new_node, goal_local_e]
                delta = -(dist_new - sobs["distance"])
                move_r = jnp.where(delta > 0, 1.0,
                                   jnp.where(delta < 0, -1.0, 0.0))
                stop_r = jnp.where(dist_new < 3.0, 2.0, -2.0)
                done = stop & real
                reward = jnp.where(
                    real, jnp.where(done, stop_r, move_r), 0.0
                ).astype(jnp.float32)

                outs = {
                    "ce": ce, "logp_a": logp_a,
                    "ent": _entropy(logp, p),
                    "value": value.astype(jnp.float32),
                    "reward": reward, "done": done, "trunc": trunc,
                    "real": real,
                    "rl_mask": (real & is_sample).astype(jnp.float32),
                    "ml_mask": (real & ml_rows).astype(jnp.float32),
                    "env_steps": real.sum().astype(jnp.int32),
                    "refills": jnp.stack(took_n),
                    "starved": starved,
                }
                if cfg.pred_back:
                    back = jnp.where(
                        sobs["logit_mask"], NEG_INF,
                        aux["back_logit"].astype(jnp.float32))
                    blogp = jax.nn.log_softmax(back, axis=-1)
                    bce = -jnp.take_along_axis(
                        blogp, sobs["back_teacher"][:, None],
                        axis=1)[:, 0]
                    outs["back_ce"] = jnp.where(real, bce, 0.0)
                if cfg.pred_pm:
                    pm = aux["pm_score"].astype(jnp.float32)
                    outs["pm_sq"] = (pm - pm_target_tab[slot_ep]) ** 2
                if cfg.agent_type == "advanced":
                    pp = aux["pred_progress"].astype(jnp.float32)
                    outs["adv_sq"] = (pp - pm_target_tab[slot_ep]) ** 2
                if cfg.agent_type == "mt":
                    # soft-distance KL over the teacher half's live rows
                    # (agent_mt.py:712-718); per-step local mean —
                    # stream-regime normalization, like pm above
                    kl_row, cnt_row = mt_kl_rows(
                        logp, sobs["teacher"], sobs["cand_point_id"],
                        sobs["cand_n"],
                        real & ml_rows & (sobs["teacher"]
                                          < sobs["cand_n"]))
                    outs["kl"] = kl_row.sum() \
                        / jnp.maximum(cnt_row.sum(), 1.0)
                if record:
                    outs["rec_action"] = a_rec
                    outs["rec_node"] = node
                    outs["rec_view"] = view
                    outs["rec_uid"] = table["uid"][slot_ep]
                    outs["rec_take"] = take

                alive = real & ~stop
                age = jnp.where(real, age + 1, age)
                return (slot_ep, alive, age, new_node, new_view,
                        new_state, noise, cur), outs

            step = real_step
            if cfg.remat == "always" or (cfg.remat == "auto" and S > 16):
                step = jax.checkpoint(real_step)
            elif cfg.remat == "dots":
                step = jax.checkpoint(
                    real_step,
                    policy=jax.checkpoint_policies.checkpoint_dots)

            sc0 = (jnp.arange(W, dtype=jnp.int32), carry["alive"],
                   carry["age"], carry["node"], carry["view"],
                   DecoderState(carry["h"], carry["c"], carry["h1"]),
                   carry["noise"], jnp.zeros((2,), jnp.int32))
            # unroll>1 keeps the backward's weight-grad accumulators
            # in VMEM across consecutive steps (config.stream_unroll);
            # XLA requires S % unroll == 0 for no remainder iteration,
            # so fall back to 1 when it doesn't divide
            unroll = cfg.stream_unroll if S % cfg.stream_unroll == 0 \
                else 1
            (slot_ep, alive, age, node, view, state, noise, cur), outs \
                = jax.lax.scan(step, sc0,
                               jnp.arange(S, dtype=jnp.int32),
                               unroll=unroll)

            # ---- window-edge bootstrap: critic value for slots still
            # mid-flight (the reference's maxAction bootstrap applied
            # at the window boundary; the episode itself continues in
            # the next window — only the return is cut here)
            _, _, _, v_edge, _, _ = forward(
                slot_ep, node, view, state,
                jnp.zeros((W,), bool), noise, jnp.asarray(S, jnp.int32))
            g_init = jnp.where(alive, ng(v_edge.astype(jnp.float32)),
                               0.0)
            # slots that exhausted maxAction exactly at the edge are
            # finished episodes (their bootstrap is g_init); kill them
            # so the next window refills without a bookkeeping step
            alive = alive & (age < T)

            # ---- losses over the slot-time grid.  Sums are LOCAL
            # (this device's slot shard); denominators are GLOBAL
            # (one psum), so the returned loss is this device's
            # contribution to the same global objective the D=1
            # program computes — grads psum outside (sharded_step)
            n_eps = jnp.stack([
                (carry["alive"] & ml_rows).sum(),
                (carry["alive"] & is_sample).sum()]).astype(jnp.int32) \
                + outs["refills"].sum(0)
            n_eps_g = allsum(n_eps)
            n_ml = jnp.maximum(n_eps_g[0].astype(jnp.float32), 1.0)

            mlm = outs["ml_mask"]
            forth_loss = (outs["ce"] * mlm).sum()
            ml_loss = forth_loss
            if cfg.pred_back:
                ml_loss = ml_loss + cfg.back_weight \
                    * (outs["back_ce"] * mlm).sum()
            logs = {"forth_loss": allsum(forth_loss),
                    "entropy": allsum(
                        (outs["ent"] * outs["rl_mask"]).sum()),
                    "env_steps": allsum(outs["env_steps"].sum())}
            if cfg.pred_pm:
                # per-episode normalization (the episodic program uses
                # a per-step batch mean; under streaming the episode is
                # the stable unit — documented regime difference)
                pm_total = cfg.pm_weight * (outs["pm_sq"] * mlm).sum()
                ml_loss = ml_loss + pm_total
                logs["pm_loss"] = allsum(pm_total / n_ml)
            if cfg.agent_type == "advanced":
                adv = (outs["adv_sq"] * mlm).sum()
                ml_loss = ml_loss + 10.0 * adv
                logs["pm_loss"] = allsum(adv / n_ml)
            if cfg.agent_type == "mt":
                kl_total = outs["kl"].sum()
                ml_loss = ml_loss + kl_total
                logs["kl_loss"] = allsum(kl_total / n_ml)
            total_loss = ml_w * ml_loss / n_ml
            logs["ml_loss"] = allsum(ml_loss / n_ml)

            G = stream_returns(outs["reward"], outs["value"],
                               outs["done"], outs["trunc"],
                               outs["real"], g_init, cfg.gamma)
            adv_t = ng(G - outs["value"])
            rlm = outs["rl_mask"]
            pg = (-outs["logp_a"] * adv_t * rlm).sum()
            critic = (0.5 * ((G - outs["value"]) ** 2) * rlm).sum()
            ent_term = (-ent_w * outs["ent"] * rlm).sum()
            rl_loss = pg + critic + ent_term
            total = allsum(rlm.sum())
            if cfg.normalize_loss == "total":
                rl_loss = rl_loss / jnp.maximum(total, 1.0)
                critic = critic / jnp.maximum(total, 1.0)
            elif cfg.normalize_loss == "batch":
                nb = jnp.maximum(n_eps_g[1].astype(jnp.float32), 1.0)
                rl_loss = rl_loss / nb
                critic = critic / nb
            total_loss = total_loss + rl_w * rl_loss
            logs["rl_loss"] = allsum(rl_w * rl_loss)
            logs["critic_loss"] = allsum(rl_w * critic)
            logs["total"] = total
            logs["loss"] = allsum(total_loss)
            # flow-control counters (host reads these LAGGED; leading
            # axis = device under the mesh, 1 otherwise)
            logs["admitted"] = adm[None]
            logs["consumed"] = cur[None]
            logs["leftover"] = (avail - cur)[None]
            logs["starved"] = allsum(outs["starved"].sum())
            logs["n_eps"] = n_eps_g
            if record:
                for key2 in ("rec_action", "rec_node", "rec_view",
                             "rec_uid", "rec_take"):
                    logs[key2] = outs[key2]
                logs["rec_real"] = outs["real"]
                logs["rec_done"] = outs["done"]
                logs["rec_trunc"] = outs["trunc"]
                # end-of-window slot state: the post-transition
                # node/view of each slot's LAST recorded step (the
                # next window's t=0 row continues the episode unless
                # it was edge-killed — this closes that gap)
                logs["rec_node_end"] = node
                logs["rec_view_end"] = view
                logs["rec_uid_end"] = table["uid"][slot_ep]

            # ---- next-window carry (all state device-resident)
            def leftover_rows(h):
                idx = jnp.clip(cur[h] + jnp.arange(E), 0, E - 1)
                return {f: region[h][f][idx] for f in RAW_FIELDS}

            lo = [leftover_rows(0), leftover_rows(1)]
            new_carry = {
                "slot_raw": {f: table[f][slot_ep] for f in RAW_FIELDS},
                "alive": alive, "age": age, "node": node, "view": view,
                "h": state.h, "c": state.c, "h1": state.h1,
                "noise": noise,
                "pool": {f: jnp.stack([lo[0][f], lo[1][f]])
                         for f in RAW_FIELDS},
                "pool_n": (avail - cur)[None],
            }
            new_carry = jax.tree_util.tree_map(ng, new_carry)
            return total_loss, (logs, new_carry)

        return loss_fn

    def _stream_grad_fn(self, feedback: str, use_noise: bool,
                        accumulate: bool, geom: StreamGeom,
                        record: bool = False):
        key = ("devstream", feedback, use_noise, accumulate, geom.key(),
               record)
        if key not in self._jit_cache:
            import functools

            loss_fn = self._make_stream_loss_fn(feedback, use_noise,
                                                geom, record=record)

            def grad_step(params, tables, env_arrays, carry, *args):
                """Per-device: local grads of the global objective (the
                loss_fn body psums its denominators)."""
                (_, (logs, new_carry)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                    params["params"], tables, env_arrays, carry, *args)
                return grads, logs, new_carry

            if geom.D > 1:
                grad_step = self._stream_shard_map(grad_step, geom,
                                                   record)

            if accumulate:
                @functools.partial(jax.jit, donate_argnums=(3, 4))
                def run(params, tables, env_arrays, grads_in, carry,
                        *args):
                    grads, logs, new_carry = grad_step(
                        params, tables, env_arrays, carry, *args)
                    grads = jax.tree_util.tree_map(jnp.add, grads,
                                                   grads_in)
                    return grads, logs, new_carry
            else:
                @functools.partial(jax.jit, donate_argnums=(3,))
                def run(params, tables, env_arrays, carry, *args):
                    return grad_step(params, tables, env_arrays, carry,
                                     *args)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _stream_eval_fn(self, geom: StreamGeom):
        """Forward-only streamed window at inference semantics: returns
        ``(logs, new_carry)`` — records only, so XLA DCEs the loss/critic
        math.  The streamed analog of `_device_eval_fn`."""
        key = ("devstream_eval", geom.key())
        if key not in self._jit_cache:
            import functools

            loss_fn = self._make_stream_loss_fn(
                "argmax", False, geom, record=True, eval_mode=True)

            def eval_step(params, tables, env_arrays, carry, *args):
                _, (logs, new_carry) = loss_fn(
                    params["params"], tables, env_arrays, carry, *args)
                return logs, new_carry

            if geom.D > 1:
                eval_step = self._stream_shard_map(eval_step, geom,
                                                   record=True,
                                                   with_grads=False)
            self._jit_cache[key] = functools.partial(
                jax.jit, donate_argnums=(3,))(eval_step)
        return self._jit_cache[key]

    def _stream_shard_map(self, grad_step, geom: StreamGeom,
                          record: bool, with_grads: bool = True):
        """Data-parallel window: shard_map over the mesh's data axis —
        each device scans its own slot shard against its own pool shard
        (device-major slot layout, zero cross-device gathers on the hot
        path), then one psum for the grads.  Replaces the reference's
        DDP loop (tasks/R2R/parallel.py) with in-program collectives."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        d = "data"

        def carry_spec(leaf_key):
            if leaf_key == "pool":
                return P(None, d)      # (2, D*E, ...) pool shards
            if leaf_key == "pool_n":
                return P(d)            # (D, 2) per-device counters
            return P(d)                # (D*W, ...) slot shards

        cspec = {k: ({f: carry_spec(k) for f in RAW_FIELDS}
                     if k in ("slot_raw", "pool") else carry_spec(k))
                 for k in ("slot_raw", "alive", "age", "node", "view",
                           "h", "c", "h1", "noise", "pool", "pool_n")}
        fresh_spec = {f: P(None, d) for f in RAW_FIELDS}
        # logs: counters carry the device axis; everything else is
        # psum-replicated inside the body; records shard on slots
        lspec = {"admitted": P(d), "consumed": P(d), "leftover": P(d)}
        log_keys = self._stream_log_keys(record)

        def log_spec(k):
            if k in lspec:
                return lspec[k]
            if k.endswith("_end"):      # (W,) end-of-window slot state
                return P(d)
            if k.startswith("rec_"):    # (S, W) slot-time records
                return P(None, d)
            return P()                  # psum-replicated scalars
        out_logs = {k: log_spec(k) for k in log_keys}

        if with_grads:
            def body(params, tables, env_arrays, carry, *args):
                grads, logs, new_carry = grad_step(
                    params, tables, env_arrays, carry, *args)
                grads = jax.lax.psum(grads, d)
                return grads, logs, new_carry
            out_specs = (P(), out_logs, cspec)
        else:
            body = grad_step
            out_specs = (out_logs, cspec)

        kwargs = dict(
            mesh=self.mesh,
            in_specs=(P(), P(), P(), cspec, fresh_spec, P(d), P(), P(),
                      P(), P()),
            out_specs=out_specs)
        try:  # jax>=0.8 spells the replication check check_vma
            return shard_map(body, check_vma=False, **kwargs)
        except TypeError:
            return shard_map(body, check_rep=False, **kwargs)

    def _stream_log_keys(self, record: bool) -> Tuple[str, ...]:
        """The exact key set loss_fn's logs dict carries (shard_map
        out_specs must mirror the pytree)."""
        cfg = self.cfg
        keys = ["forth_loss", "entropy", "env_steps", "ml_loss",
                "rl_loss", "critic_loss", "total", "loss", "admitted",
                "consumed", "leftover", "starved", "n_eps"]
        if cfg.pred_pm or cfg.agent_type == "advanced":
            keys.append("pm_loss")
        if cfg.agent_type == "mt":
            keys.append("kl_loss")
        if record:
            keys += ["rec_action", "rec_node", "rec_view", "rec_uid",
                     "rec_take", "rec_real", "rec_done", "rec_trunc",
                     "rec_node_end", "rec_view_end", "rec_uid_end"]
        return tuple(keys)

    # ---------------------------------------------------------------
    # host staging
    # ---------------------------------------------------------------
    def _stream_template_row(self) -> dict:
        """A safe placeholder episode: one valid token (an all-padding
        mask would NaN the text attention and the NaN leaks through the
        loss masking's where-gradients), node 0 with itself as goal."""
        L = self.cfg.max_input
        valid = np.zeros(L, bool)
        valid[0] = True
        return {"instr": np.zeros(L, np.int32), "valid": valid,
                "seq_len": np.int32(1), "node0": np.int32(0),
                "view0": np.int32(12), "goal": np.int32(0),
                "start": np.int32(0), "uid": np.int32(-1)}

    def _stream_init_carry(self, geom: StreamGeom):
        from dasa_tpu.models.policy import decoder_state_width

        cfg = self.cfg
        W, E, D = geom.W_glob, geom.E_glob, geom.D
        tpl = self._stream_template_row()
        dec_h = decoder_state_width(cfg)

        def rows(n):
            return {f: jnp.asarray(np.broadcast_to(
                tpl[f], (n,) + np.shape(tpl[f])).copy())
                for f in RAW_FIELDS}

        carry = {
            "slot_raw": rows(W),
            "alive": jnp.zeros((W,), bool),
            "age": jnp.zeros((W,), jnp.int32),
            "node": jnp.zeros((W,), jnp.int32),
            "view": jnp.full((W,), 12, jnp.int32),
            "h": jnp.zeros((W, dec_h), self.dtype),
            "c": jnp.zeros((W, dec_h), self.dtype),
            "h1": jnp.zeros((W, dec_h), self.dtype),
            "noise": jnp.ones((W, cfg.feature_size), self.dtype),
            "pool": {f: jnp.stack([rows(E)[f], rows(E)[f]])
                     for f in RAW_FIELDS},
            "pool_n": jnp.zeros((D, 2), jnp.int32),
        }
        return self._stream_place_carry(carry)

    def _stream_place_carry(self, carry):
        """Pin the carry to its shard_map layout (slot/pool shards) so
        the donated round trip keeps one stable sharding."""
        if self.mesh is None:
            return carry
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def put(spec):
            s = NamedSharding(self.mesh, spec)
            return lambda x: jax.device_put(x, s)

        out = dict(carry)
        for k in ("alive", "age", "node", "view", "h", "c", "h1",
                  "noise", "pool_n"):
            out[k] = put(P("data"))(carry[k])
        out["slot_raw"] = {f: put(P("data"))(carry["slot_raw"][f])
                           for f in RAW_FIELDS}
        out["pool"] = {f: put(P(None, "data"))(carry["pool"][f])
                       for f in RAW_FIELDS}
        return out

    def _stream_host(self) -> _StreamHost:
        """Per-env stream state (the trainer swaps org/aug envs; each
        keeps its own carry, FIFO, and flow ledger)."""
        cache = getattr(self, "_stream_cache", None)
        if cache is None:
            cache = self._stream_cache = {}
        key = id(self.env)
        # ALWAYS re-point self._dev_env at the current env's tables:
        # an intervening eval (or the org/aug alternation) may have
        # left it on another env, and staging/dispatch against the
        # wrong world tables is silently wrong when the scan sets
        # overlap (KeyError when they don't)
        self._device_env_tables()
        if key not in cache:
            geom = self._stream_geom()
            cache[key] = (self.env, _StreamHost(
                geom, self._stream_init_carry(geom),
                self._stream_template_row(),
                consumed_est=geom.E / 1.3))
        return cache[key][1]

    def _stream_refill_fifo(self, st: _StreamHost, need: int) -> None:
        from dasa_tpu.env.device_env import episode_inputs

        env = self.env
        self.stream_timer.tic("refill_fifo")
        while len(st.fifo) < need:
            env.reset()
            ep = episode_inputs(env, self._dev_env)
            static = env._static
            for i in range(len(env.batch)):
                st.fifo.append({
                    "instr": static["instr"][i].astype(np.int32),
                    "valid": ~static["pad_mask"][i],
                    "seq_len": np.int32(static["seq_len"][i]),
                    "node0": np.int32(ep["node0"][i]),
                    "view0": np.int32(ep["view0"][i]),
                    "goal": np.int32(ep["goal"][i]),
                    "start": np.int32(ep["start"][i]),
                    "uid": np.int32(st.next_uid),
                    "instr_id": env.batch[i].get("instr_id"),
                })
                st.staged[st.next_uid] = st.fifo[-1]
                st.next_uid += 1
        self.stream_timer.toc("refill_fifo")

    def _settle_stream_window(self, st: _StreamHost) -> None:
        """Read one lagged window's flow counters and reconcile: chunk
        tails a pool shard had no room for go back to the FIFO front
        (the device never saw them), and the exact leftover/consumed
        counts re-anchor the inventory estimate."""
        sent, flow = st.inflight.popleft()
        self.stream_timer.tic("settle_sync")
        adm = np.asarray(flow["admitted"])       # (D, 2)
        consumed = np.asarray(flow["consumed"])  # (D, 2)
        self.stream_timer.toc("settle_sync")
        D = st.geom.D
        # appendleft in exact reverse of the staging pop order
        # (h-major, then device) so re-queued items keep FIFO order
        for h in (1, 0):
            for d in reversed(range(D)):
                for it in reversed(sent[h][d][int(adm[d, h]):]):
                    st.fifo.appendleft(it)
        st.leftover_settled = np.asarray(flow["leftover"]).astype(
            np.int64)
        st.consumed_est = np.maximum(consumed.astype(np.float64), 1.0)

    def _stage_stream_fresh(self, st: _StreamHost):
        """Assemble this window's fixed-shape fresh chunks — one
        per-device segment per half, targeting full pool shards under
        the lagged inventory estimate."""
        E, D = st.geom.E, st.geom.D
        while len(st.inflight) >= 2:  # settle all but the running window
            self._settle_stream_window(st)
        inv = st.inventory_est()                       # (D, 2)
        f_n = np.clip(E - inv, 0, E).astype(np.int32)  # (D, 2)
        self._stream_refill_fifo(st, int(f_n.sum()))
        sent = [[[st.fifo.popleft() for _ in range(int(f_n[d, h]))]
                 for d in range(D)] for h in (0, 1)]

        self.stream_timer.tic("stage_arrays")
        fresh = {}
        for f in RAW_FIELDS:
            shape = (2, D * E) + np.shape(st.template[f])
            arr = np.broadcast_to(st.template[f], shape).copy()
            for h in (0, 1):
                for d in range(D):
                    for i, it in enumerate(sent[h][d]):
                        arr[h, d * E + i] = it[f]
            fresh[f] = jnp.asarray(arr)
        out = self._stream_place_fresh(fresh), jnp.asarray(f_n), sent
        self.stream_timer.toc("stage_arrays")
        return out

    def _stream_place_fresh(self, fresh):
        if self.mesh is None:
            return fresh
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        s = NamedSharding(self.mesh, P(None, "data"))
        return {f: jax.device_put(v, s) for f, v in fresh.items()}

    # ---------------------------------------------------------------
    # training entry
    # ---------------------------------------------------------------
    def device_rollout_stream(self, train_ml: Optional[float],
                              feedback: str = "sample",
                              record: bool = False) -> None:
        """One streamed optimizer window (the stream-mode analog of one
        accumulate_gradient('sample') pair): a single fused
        act+grad+refill dispatch; fetches nothing (flow counters are
        read lagged by `_stage_stream_fresh`).  record=True additionally
        returns the slot-time trajectory grid into ``st.records``
        (separate compiled variant — tests/trajectory extraction)."""
        cfg = self.cfg
        use_noise = cfg.consistent_drop
        st = self._stream_host()
        fresh, f_n, sent = self._stage_stream_fresh(st)
        base_rng = jax.random.fold_in(self._base_rng,
                                      self._rollout_counter)
        self._rollout_counter += 1
        ml_w = jnp.asarray(float(train_ml or 0.0), jnp.float32)
        rl_w = jnp.asarray(1.0, jnp.float32)
        ent_w = jnp.asarray(0.01 if feedback == "sample" else 0.0,
                            jnp.float32)
        fn = self._stream_grad_fn(feedback, use_noise,
                                  self._grad_accum is not None,
                                  st.geom, record=record)
        self.stream_timer.tic("dispatch")
        if self._grad_accum is None:
            grads, logs, st.carry = fn(
                self.params, self.tables, self._dev_env.arrays(),
                st.carry, fresh, f_n, base_rng, ml_w, rl_w, ent_w)
        else:
            grads, logs, st.carry = fn(
                self.params, self.tables, self._dev_env.arrays(),
                self._grad_accum, st.carry, fresh, f_n, base_rng,
                ml_w, rl_w, ent_w)
        self.stream_timer.toc("dispatch")
        self.stream_timer.step()
        self._grad_accum = grads
        st.inflight.append((sent,
                            {kk: logs[kk] for kk in
                             ("admitted", "consumed", "leftover")}))
        if record:
            st.records.append({kk: np.asarray(v)
                               for kk, v in logs.items()
                               if kk.startswith("rec_")})
        self._env_steps_log.append(logs["env_steps"])
        # episodes started this window (device handle, fetched lazily):
        # starts ~= completions over a run, so steps/starts estimates
        # the mean episode length without a per-window sync
        self.logs["stream_consumed"].append(logs["consumed"])
        for k2 in ("forth_loss", "entropy", "ml_loss", "rl_loss",
                   "critic_loss", "total", "loss", "pm_loss", "kl_loss"):
            if k2 in logs:
                self.logs[k2].append(logs[k2])
        self.losses.append(logs["loss"])

    # ---------------------------------------------------------------
    # streamed evaluation
    # ---------------------------------------------------------------
    def stream_test_loop(self) -> None:
        """Streamed device evaluation: the whole split flows through
        the persistent slots at full utilization (the eval analog of
        device_rollout_stream; reference loop BaseAgent.test,
        agent_dg.py:58-100).  Fills ``self.results`` exactly like
        `_device_test_batch` — the episodic device eval is the
        semantics oracle (tests/test_stream.py).  Fresh host state per
        call: eval must see current params and must not touch the
        training carries."""
        from dasa_tpu.sim.engine import micro_trajectory

        cfg = self.cfg
        env = self.env
        T = cfg.max_action
        dev = self._device_env_tables()
        geom = self._stream_geom()
        st = _StreamHost(geom, self._stream_init_carry(geom),
                         self._stream_template_row(),
                         consumed_est=geom.E / 1.3)
        fn = self._stream_eval_fn(geom)
        zero = jnp.zeros((), jnp.float32)
        segs: Dict[int, dict] = {}

        node2vp = {}
        for scan in env.scans:
            gids, base = env.graphs[scan].ids, dev.base[scan]
            for ix, vid in enumerate(gids):
                node2vp[base + ix] = vid

        def angles(view):
            return ((int(view) % 12) * (np.pi / 6),
                    (int(view) // 12 - 1) * (np.pi / 6))

        def finish(seg):
            states = seg["states"]
            tr = [(node2vp[states[0][0]], *angles(states[0][1]))]
            for (n0, v0), (n1, v1) in zip(states, states[1:]):
                micro_trajectory(node2vp[n0], int(v0), int(v1), tr)
                tr.append((node2vp[n1], *angles(v1)))
            iid = seg["instr_id"]
            self.results[iid] = {"instr_id": iid, "trajectory": tr}

        def process(rec):
            S, Wg = rec["rec_action"].shape
            for w in range(Wg):
                for t in range(S):
                    uid = int(rec["rec_uid"][t, w])
                    if uid < 0:
                        continue
                    if rec["rec_trunc"][t, w]:
                        # bookkeeping row: the episode's post-move
                        # final state after its T-th step
                        seg = segs.get(uid)
                        if seg is not None and not seg["complete"]:
                            seg["states"].append(
                                (int(rec["rec_node"][t, w]),
                                 int(rec["rec_view"][t, w])))
                            seg["complete"] = True
                            finish(seg)
                        continue
                    if not rec["rec_real"][t, w]:
                        continue
                    seg = segs.get(uid)
                    if seg is None:
                        seg = segs[uid] = {
                            "states": [], "steps": 0, "complete": False,
                            "instr_id": st.staged[uid]["instr_id"]}
                    if seg["complete"]:
                        continue
                    seg["states"].append((int(rec["rec_node"][t, w]),
                                          int(rec["rec_view"][t, w])))
                    seg["steps"] += 1
                    self.total_env_steps += 1
                    if rec["rec_done"][t, w]:
                        seg["complete"] = True
                        finish(seg)
            # slots edge-killed at exactly T real steps have no trunc
            # row (the window-edge kill refills them next window): the
            # end-of-window slot state closes them
            for w in range(Wg):
                uid = int(rec["rec_uid_end"][w])
                seg = segs.get(uid)
                if seg is not None and not seg["complete"] \
                        and seg["steps"] >= T:
                    seg["states"].append((int(rec["rec_node_end"][w]),
                                          int(rec["rec_view_end"][w])))
                    seg["complete"] = True
                    finish(seg)

        size = env.size()
        per_window = max(geom.D * geom.W * geom.S, 1)
        max_windows = 4 + 3 * -(-size * T // per_window)
        pending = None
        for _ in range(max_windows):
            fresh, f_n, sent = self._stage_stream_fresh(st)
            logs, st.carry = fn(self.params, self.tables, dev.arrays(),
                                st.carry, fresh, f_n, self._base_rng,
                                zero, zero, zero)
            st.inflight.append((sent, {kk: logs[kk] for kk in
                                       ("admitted", "consumed",
                                        "leftover")}))
            if pending is not None:  # lagged fetch: no per-window sync
                process({kk: np.asarray(v) for kk, v in pending.items()
                         if kk.startswith("rec_")})
                if len(self.results) >= size:
                    pending = None
                    break
            pending = logs
        if pending is not None:
            process({kk: np.asarray(v) for kk, v in pending.items()
                     if kk.startswith("rec_")})

    def precompile_stream(self) -> None:
        """Compile (or AOT-load) the stream window program with
        shape-identical DUMMY chunks — no episode data or rng stream is
        consumed, unlike the episodic precompile's snapshot dance."""
        from dasa_tpu.utils.aot_cache import enabled as aot_enabled
        from dasa_tpu.utils.aot_cache import load_or_compile

        use_noise = self.cfg.consistent_drop
        st = self._stream_host()
        E, D = st.geom.E, st.geom.D
        fresh = self._stream_place_fresh(
            {f: jnp.asarray(np.broadcast_to(
                st.template[f],
                (2, D * E) + np.shape(st.template[f])).copy())
             for f in RAW_FIELDS})
        f_n = jnp.zeros((D, 2), jnp.int32)
        args_tail = (fresh, f_n, self._base_rng,
                     jnp.asarray(0.2, jnp.float32),
                     jnp.asarray(1.0, jnp.float32),
                     jnp.asarray(0.01, jnp.float32))
        key = ("devstream", "sample", use_noise, False, st.geom.key(),
               False)
        fn = self._stream_grad_fn("sample", use_noise, False, st.geom)
        args = (self.params, self.tables, self._dev_env.arrays(),
                st.carry, *args_tail)
        if aot_enabled() and self.mesh is None:
            self._jit_cache[key] = load_or_compile(
                "devstream", fn, args,
                extra_key=f"{self.cfg.to_json()}|{key}")
        else:
            # warm by AOT-style lowering (no dispatch: donation would
            # invalidate the live carry buffers)
            fn.lower(*args).compile()
