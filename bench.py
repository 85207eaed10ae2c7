#!/usr/bin/env python
"""Headline benchmark: DASA training throughput on one TPU chip.

Runs the full-size DASA config (reference README.md:82-98) at batchSize
20 on synthetic features over real connectivity graphs, times steady-
state optimizer iterations over THREE windows, and prints ONE JSON
line.  The default regime is the streamed (continuous-batching)
training window — mixed teacher-ML + sampled-RL slots, grad
accumulation, RMSProp update, identical per-episode data/returns to
the episodic path (tests/test_stream.py); DASA_BENCH_STREAM=0 times
the episodic teacher+sample pair instead:

    {"metric": "agent_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N, "mfu": N, ...}

- `value` is the mean of the three windows; `spread_pct` is
  (max-min)/mean across windows — deltas inside the spread are noise.
- `mfu` divides achieved model FLOP/s (analytic matmul count per
  agent-step, see `analytic_flops_per_agent_step`) by the chip's peak.
- The episode set, iteration order, and rng stream are pinned by a
  committed fixture (data/bench_fixture.json) + fixed seeds, so
  round-over-round deltas are attributable to code changes.

See BENCH_NOTES.md for the agent-step definition and the reference
baseline estimate (with sensitivity bounds).
"""

import json
import os
import sys
import time

# persistent compile cache: repeated bench runs skip the multi-minute
# first-compile of the scanned replay programs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

REF_AGENT_STEPS_PER_SEC = 135.0  # estimate; bounds in BENCH_NOTES.md
PEAK_FLOPS = float(os.environ.get("DASA_PEAK_FLOPS", 197e12))  # v5e bf16

CONNECTIVITY = "/root/reference/connectivity"
FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "bench_fixture.json")


def analytic_flops_per_agent_step(cfg, avg_episode_len: float) -> float:
    """Matmul FLOPs per (episode, env-step) pair for the training
    workload.  Counts the dominant contractions only (transformer
    layers, LSTMs, dense projections; attention-score terms included,
    elementwise/softmax excluded) — the MFU convention.

    Backward cost (~2x forward) is charged ONLY to modules that
    receive gradients: the cross-modal stack is forward-only unless
    d_update_add_layer (cross_forward stop_gradients its outputs,
    models/bert.py:361-363, mirroring vilmodel.py's update_add_layer
    gate) and the text stack likewise unless d_transformer_update.
    Cross-checked against TPU profiler model-FLOP counters at the
    headline config: analytic 16.07G vs measured 16.30G per agent-step
    (1.4% low — scripts/trace_ops.py MFU cross-check, BENCH_NOTES.md).
    The pre-correction formula charged backward to the frozen stacks
    too and overcounted 2.05x (33.39G), which is what the round-3
    "78% MFU" claim rested on; the honest figure is ~38%.

    Derivation (per policy step, per episode, forward):
      - 3 LXRTX cross layers over (L lang + 36 vision) tokens at
        H=768: per layer per token ~16 H^2 MACs (QKVO self 4H^2 +
        FFN 8H^2 + cross-attn q/kv/out ~4H^2)   [models/bert.py]
      - vision encoder dense: 36 * F_all * H     [models/bert.py]
      - top BiLSTM: L tokens x 2 dirs x (H_bert + H_enc) * 4H_enc
                                                  [models/encoder.py]
      - decoder LSTMCell + attentions + candidate logits
                                                  [models/decoder.py]
      - 9 text-only BERT layers run once per episode (cached), so
        12 H^2 L * 9 is amortized over the episode length.
    """
    H = 1024 if cfg.d_bert_type == "large" else 768
    L = cfg.max_input
    V = cfg.views
    F = cfg.feature_all_size
    He = cfg.d_enc_hidden_size          # per-direction top-LSTM width
    Hd = cfg.d_hidden_size
    macs_cross = cfg.d_vl_layers * 16 * (L + V) * H * H \
        + cfg.d_vl_layers * 2 * (2 * L * V + L * L + V * V) * H
    macs_vis = V * F * H
    macs_lstm = L * 2 * (H + He) * 4 * He
    macs_enc2dec = 2 * 2 * He * Hd
    macs_dec = (F + cfg.aemb + Hd) * 4 * Hd \
        + (2 * Hd * F) + (2 * He * Hd) + (cfg.max_candidates * Hd * F) \
        + Hd * F  # pano att + instr att + cand logits + action embed
    macs_text = cfg.d_la_layers * (12 * H * H * L + 2 * L * L * H)
    amort_text = macs_text / max(avg_episode_len, 1.0)
    groups = [  # (MACs, participates in backward?)
        (macs_cross + macs_vis, bool(cfg.d_update_add_layer)),
        (amort_text, bool(cfg.d_transformer_update)),
        (macs_lstm + macs_enc2dec + macs_dec, True),
    ]
    total_macs = sum(m * (3.0 if trains else 1.0) for m, trains in groups)
    return total_macs * 2  # MACs -> FLOPs


def _probe_backend(timeout_s: float) -> None:
    """Fail FAST if the axon tunnel is unreachable instead of blocking
    forever: when the TPU service is down, even ``jax.devices()`` hangs
    indefinitely in-process (observed 4h+ outages — BENCH_NOTES.md), so
    probe it in a subprocess with a hard timeout before committing this
    process to backend init."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print(d[0].platform, len(d))"],
            check=True, timeout=timeout_s, capture_output=True)
    except subprocess.TimeoutExpired:
        print(f"bench: TPU backend unreachable (no jax.devices() within "
              f"{timeout_s:.0f}s — axon tunnel down?).  Re-run when the "
              f"service is back, or DASA_BENCH_CPU=1 for a CPU smoke.",
              file=sys.stderr)
        sys.exit(3)
    except subprocess.CalledProcessError as e:  # pragma: no cover
        print(f"bench: backend probe failed: {e.stderr.decode()[-500:]}",
              file=sys.stderr)
        sys.exit(3)


def main():
    if os.environ.get("DASA_BENCH_CPU") != "1":
        _probe_backend(float(os.environ.get(
            "DASA_BENCH_PROBE_TIMEOUT", "150")))
    if os.environ.get("DASA_BENCH_CPU") == "1":
        # force CPU before first backend use (env vars alone lose to
        # sitecustomize's axon registration; with the axon service
        # unreachable even backend init blocks — CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dasa_tpu.agents import Seq2SeqAgent
    from dasa_tpu.config import Config
    from dasa_tpu.data.datasets import (
        expand_instructions,
        generate_synthetic_dataset,
    )
    from dasa_tpu.data.features import FeatureDB
    from dasa_tpu.env import R2REnv
    from dasa_tpu.utils import Tokenizer, build_vocab

    fast = os.environ.get("DASA_BENCH_FAST") == "1"
    # DASA_BENCH_SELFTRAIN=1: time the FULL headline-command workload
    # (README.md:82-98, --train auglistener --selfTrain --speaker ...)
    # — org/aug accumulate alternation with speaker back-translation
    # inference inside the timed loop (agent_dg.py:656-675).  Episodic
    # combined regime: the streamed window cannot host the mid-stream
    # relabel, and the reference's update structure IS the org/aug
    # pair (train.py:226-243).
    selftrain = os.environ.get("DASA_BENCH_SELFTRAIN") == "1"
    # DASA_BENCH_FINETUNE=1: the finetune-ladder config (BASELINE
    # config #5, README.md:101-118): the same auglistener+selfTrain
    # loop with the cross-modal add-layers unfrozen
    # (--d_update_add_layer True), batchSize 2, lr 2e-6.  The analytic
    # FLOPs formula charges the cross stack's backward when the flag is
    # set (test_bench_formula.py).
    finetune = os.environ.get("DASA_BENCH_FINETUNE") == "1"
    selftrain = selftrain or finetune
    cfg = Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", angle_feat_size=128,
        feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
        critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
        max_action=35,
        # reference headline batch (README.md:82); DASA_BENCH_BATCH
        # widens the stream window (W = 2*batch slots) for MXU-
        # efficiency A/Bs — a throughput knob like stream_steps/pool
        batch_size=int(os.environ.get("DASA_BENCH_BATCH",
                                      "2" if finetune else "20")),
        featdropout=0.4, optim="rms",
        lr=2e-6 if finetune else 1e-4,  # README.md:115
        use_lr_scheduler=True, ml_weight=0.2,
        connectivity_dir=CONNECTIVITY,
        compute_dtype="bfloat16",
        # the headline config's 35-step fused scan fits HBM without
        # rematerialization; skipping the backward recompute measured
        # 817 -> 1125 agent-steps/s (BENCH_NOTES.md).  "never" is also
        # the Config default; "percept" is the bounded-memory fallback
        # for larger models.
        remat=os.environ.get("DASA_BENCH_REMAT", "never"),
        # A/B knobs for the round-3 levers (both default-on in Config).
        # PALLAS=always (fused shift/AdaIN kernels) measured 4913 vs
        # 5131 steps/s at the headline config (round 5, -4.2%): XLA's
        # in-scan fusions beat the hand kernels here, so "auto" keeps
        # enabling only the LSTM kernel (BENCH_NOTES.md round-5).
        use_pallas=os.environ.get("DASA_BENCH_PALLAS", "auto"),
        bf16_grad_accum=os.environ.get("DASA_BENCH_BF16ACC", "1") == "1",
        # fused teacher+sample accumulate pair: 1364 -> 1445 steps/s
        # (the teacher half rides the 2B-wide sampled scan's weight
        # reads nearly free; BENCH_NOTES.md round-3)
        fuse_passes=os.environ.get("DASA_BENCH_FUSE", "auto"),
        # hardware RNG for per-step dropout masks: 1667 -> 1908 steps/s
        # (threefry bits hide inside every fused dropout op;
        # BENCH_NOTES.md round-3).  DASA_BENCH_PRNG=threefry for A/B.
        prng_impl=os.environ.get("DASA_BENCH_PRNG", "rbg"),
        # continuous batching (agents/stream.py): every scan row stays
        # on a live episode; one optimizer window per iteration.
        # Headline default — measured 5129 steps/s (38x, 41.5% MFU,
        # 1.66% spread) vs 1869-1908 episodic on the same chip/fixture
        # (BENCH_NOTES.md round-4).  DASA_BENCH_STREAM=0 for the
        # episodic A/B; _STEPS/_POOL sweep the window length and
        # per-half pool capacity (0 = auto, the measured knee).
        rollout_mode=("stream"
                      if os.environ.get("DASA_BENCH_STREAM", "1") == "1"
                      and not selftrain else "episodic"),
        self_train=selftrain,
        ml_weight_org=0.4, ml_weight_aug=1.2,  # README.md:83-84
        d_update_add_layer=finetune,  # README.md:104
        stream_steps=int(os.environ.get("DASA_BENCH_STREAM_STEPS", "0")),
        stream_pool=int(os.environ.get("DASA_BENCH_STREAM_POOL", "0")),
        # window-scan unroll factor (must divide the window length,
        # 35 by default -> 5 or 7): amortizes the backward's weight-
        # grad accumulator HBM traffic across k steps
        stream_unroll=int(os.environ.get("DASA_BENCH_UNROLL", "1")),
    )
    if fast:  # plumbing smoke for CPU runs, not a benchmark
        cfg = cfg.replace(d_la_layers=1, d_vl_layers=1, batch_size=4,
                          max_action=6, feature_size=64, angle_feat_size=8,
                          d_enc_hidden_size=32, d_hidden_size=64,
                          critic_dim=64, max_input=24,
                          compute_dtype="float32")

    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    # pinned episode set: the committed fixture freezes the synthetic
    # items; generation is seeded so the fixture regenerates identically
    # if deleted
    if os.path.exists(FIXTURE) and not fast:
        with open(FIXTURE) as f:
            data = json.load(f)
    else:
        data = generate_synthetic_dataset(scans, 40,
                                          connectivity_dir=CONNECTIVITY,
                                          min_hops=4, max_hops=6)
        if not fast:
            os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
            with open(FIXTURE, "w") as f:
                json.dump(data, f)
    vocab = build_vocab(data, min_count=1)
    tok = Tokenizer(vocab, encoding_length=cfg.max_input)
    items = expand_instructions(data, tok, max_input=cfg.max_input)
    feature_db = FeatureDB.synthetic(scans, CONNECTIVITY,
                                     dim=cfg.feature_size)
    depth_db = FeatureDB.synthetic(scans, CONNECTIVITY,
                                   dim=cfg.feature_size, salt=7)
    env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                 connectivity_dir=CONNECTIVITY,
                 max_candidates=cfg.max_candidates,
                 max_input=cfg.max_input, depth_db=depth_db)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))

    if selftrain:
        from dasa_tpu.agents.speaker import SpeakerAgent

        # aug env: a second pinned synthetic split over the same scans
        # (the reference's aug_paths.json role); the speaker decodes
        # with the shared featdrop mask inside every aug accumulate
        aug_fixture = FIXTURE.replace(".json", "_aug.json")
        if os.path.exists(aug_fixture) and not fast:
            with open(aug_fixture) as f:
                aug_data = json.load(f)
        else:
            aug_data = generate_synthetic_dataset(
                scans, 40, connectivity_dir=CONNECTIVITY, min_hops=4,
                max_hops=6, seed=17, path_id_base=100000)
            if not fast:
                with open(aug_fixture, "w") as f:
                    json.dump(aug_data, f)
        aug_items = expand_instructions(aug_data, tok,
                                        max_input=cfg.max_input)
        aug_env = R2REnv(feature_db, aug_items,
                         batch_size=cfg.batch_size,
                         connectivity_dir=CONNECTIVITY,
                         max_candidates=cfg.max_candidates,
                         max_input=cfg.max_input, depth_db=depth_db)
        speaker = SpeakerAgent(cfg, env, feature_db,
                               vocab_size=len(tok), tok=tok)

        def one_iter():
            # the reference's aug alternation (train.py:226-243): one
            # optimizer step per org+aug accumulate pair, speaker
            # back-translation on the aug half
            agent.zero_grad()
            agent.env = env
            agent.accumulate_gradient("sample",
                                      ml_weight=cfg.ml_weight_org)
            agent.env = aug_env
            agent.accumulate_gradient("sample",
                                      ml_weight=cfg.ml_weight_aug,
                                      speaker=speaker)
            agent.optim_step()
    else:
        def one_iter():
            agent.zero_grad()
            agent.accumulate_gradient("sample")
            agent.optim_step()

    # warmup: compile the programs the timed loop will use (device path:
    # the two rollout-grad programs, compiled concurrently, + tree-add
    # + apply)
    t0 = time.time()
    if selftrain:
        pass  # the combined+speaker programs compile on first one_iter
    elif agent.use_stream_rollout():
        agent.precompile_stream()
    elif agent.use_device_rollout():
        agent.precompile_device()
    else:
        agent.precompile_replay(cfg.batch_size)
    one_iter()
    float(np.asarray(agent.losses[-1]))  # force through the async queue
    warm = time.time() - t0

    # ramp: untimed iterations between compile and the timed windows.
    # The streamed regime is not at steady state for the first ~2-3
    # windows (pool fill, two-window-lagged flow control, cold-policy
    # episode lengths) — timing it raw produced a 26% window spread in
    # round 3 (BENCH_r03: 3902/4973/5136).  Burning the ramp here makes
    # the three timed windows measure the same regime a production run
    # lives in; episode-length drift from the policy *training* remains
    # (it is the workload), but the transient is gone.
    ramp_iters = int(os.environ.get("DASA_BENCH_RAMP",
                                    "0" if fast else "21"))
    t0 = time.time()
    for _ in range(ramp_iters):
        one_iter()
    if ramp_iters:
        float(np.asarray(agent.losses[-1]))
    ramp_dt = time.time() - t0
    if agent.use_stream_rollout():
        agent.stream_timer.reset()  # report the timed windows only

    # timed windows: 3 x 7 iterations.  Each window's loop fetches
    # NOTHING (device dispatch is async and the fused rollouts never
    # sync); the clock stops on a value fetch that depends on the final
    # iteration's work, so queued work cannot leak across windows.
    n_windows = 1 if fast else 3
    iters_per_window = 2 if fast else 7
    window_rates = []
    all_iter_steps = []
    total_steps = 0
    total_dt = 0.0
    consumed_idx0 = len(agent.logs["stream_consumed"])
    for _w in range(n_windows):
        agent.total_env_steps = 0
        agent._env_steps_log = []
        t0 = time.time()
        for _ in range(iters_per_window):
            one_iter()
        final_sync = float(np.asarray(agent.losses[-1]))
        dt = time.time() - t0
        steps = agent.env_steps_total()
        window_rates.append(steps / dt)
        all_iter_steps.extend(int(x) for x in agent._env_steps_log)
        total_steps += steps
        total_dt += dt

    steps_per_sec = float(np.mean(window_rates))
    spread_pct = 100.0 * (max(window_rates) - min(window_rates)) \
        / steps_per_sec
    if agent.use_stream_rollout():
        # episode starts ~= completions at steady state; each timed
        # iteration is one streamed window
        n_eps = float(np.sum([np.asarray(c) for c in
                              agent.logs["stream_consumed"]
                              [consumed_idx0:]]))
        avg_ep_len = total_steps / max(n_eps, 1.0)
    else:
        # episodes per iteration: one accumulate call = the 2B-wide
        # combined pair; selfTrain runs TWO accumulate calls (org+aug)
        eps_per_iter = (4 if selftrain else 2) * cfg.batch_size
        avg_ep_len = (total_steps / (n_windows * iters_per_window
                                     * eps_per_iter))
    flops_step = analytic_flops_per_agent_step(cfg, avg_ep_len)
    mfu = steps_per_sec * flops_step / PEAK_FLOPS

    result = {
        "metric": "agent_steps_per_sec",
        # the selfTrain arm counts LISTENER agent-steps only; the
        # speaker decode runs untallied inside the timed loop, and the
        # analytic MFU formula likewise excludes speaker FLOPs (the
        # reported mfu is a lower bound for this arm)
        **({"arm": "finetune"} if finetune
           else {"arm": "selftrain"} if selftrain else {}),
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_AGENT_STEPS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "spread_pct": round(spread_pct, 2),
        "windows": [round(r, 1) for r in window_rates],
    }
    print(json.dumps(result))
    if agent.use_stream_rollout():
        t = agent.stream_timer
        phases = ", ".join(
            f"{k}={v:.2f}s" for k, v in sorted(t.culmu.items(),
                                               key=lambda kv: -kv[1]))
        print(f"# host-phase wall time over the {t.iteration} timed "
              f"windows ({total_dt:.2f}s): {phases}", file=sys.stderr)
    print(f"# warmup(compile)={warm:.1f}s, "
          f"ramp={ramp_iters} iters in {ramp_dt:.1f}s, {n_windows}x"
          f"{iters_per_window} iters in {total_dt:.1f}s, "
          f"{total_steps} agent-steps, avg_ep_len={avg_ep_len:.1f}, "
          f"flops/step={flops_step / 1e9:.1f}G, "
          f"per-iter steps min {min(all_iter_steps) if all_iter_steps else 0}"
          f" / max {max(all_iter_steps) if all_iter_steps else 0}, "
          f"final_loss={final_sync:.3f}, "
          f"backend={__import__('jax').default_backend()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
