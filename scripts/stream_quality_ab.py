#!/usr/bin/env python
"""Stream-vs-episodic training QUALITY A/B at matched agent-step counts.

The streamed (continuous-batching) regime is the bench headline, but it
changes optimizer-step granularity, the teacher:sample episode ratio,
and the noise stream vs episodic training (agents/stream.py:39-45).
This script answers the question those differences raise: does a
stream-trained policy reach the same SR/SPL **per agent-step** as
episodic training?  (Reference training semantics being matched:
agent_dg.py:1347-1384, train.py:226-243.)

Method: the full-scale DASA config (bench.py headline dims) trains on
the synthetic task (scripts/make_task.py) in BOTH regimes from the same
seed, and each run validates val_seen/val_unseen (device argmax eval →
Evaluation.score) every time its cumulative agent-step counter crosses
a shared milestone.  Results print as a markdown table (BENCH_NOTES.md)
and dump to JSON.

Usage:
    python scripts/stream_quality_ab.py                   # TPU, full
    python scripts/stream_quality_ab.py --fast            # CPU smoke
    python scripts/stream_quality_ab.py --total_steps 400000
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def full_cfg(args):
    from dasa_tpu.config import Config

    cfg = Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", angle_feat_size=128,
        feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
        critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
        max_action=35, batch_size=args.batch_size, featdropout=0.4,
        optim="rms",
        # --lr/--warm_steps/--decay_* override the reference schedule
        # for the LARGE-UPDATE arms: the schedule is denominated in
        # optimizer ITERATIONS, so at stream-auto granularity (~1456
        # agent-steps/update vs the episodic pair's ~235) an unscaled
        # run spends all 600k A/B steps inside warmup at <0.4x peak LR.
        # Scaling warmup/decay by 1/k re-aligns them in agent-steps,
        # and lr by sqrt(k) (the adaptive-optimizer large-batch rule —
        # RMSProp's per-parameter normalization makes the update
        # magnitude ~invariant to gradient scale, so the linear SGD
        # rule overshoots; sqrt tracks the reduced gradient noise).
        lr=args.lr or 1e-4, use_lr_scheduler=True, ml_weight=0.2,
        warm_steps=args.warm_steps or 1000,
        decay_start=args.decay_start or 4000,
        decay_intervals=args.decay_intervals or 2000,
        compute_dtype="bfloat16", fuse_passes="auto", prng_impl="rbg",
        data_dir=args.data_dir, seed=1, name="stream_ab",
    )
    if args.fast:
        cfg = cfg.replace(
            d_la_layers=1, d_vl_layers=1, batch_size=4, max_action=6,
            feature_size=32, angle_feat_size=8, d_enc_hidden_size=16,
            d_hidden_size=32, critic_dim=32, max_input=20,
            compute_dtype="float32", lr=1e-3, optim="adam",
            prng_impl="threefry")
    return cfg


def run_regime(cfg, regime, milestones, log):
    """Train one regime, validating at each agent-step milestone.

    `regime` is "episodic", "stream" (auto geometry), or "stream:S"
    (window of S scan steps — stream:8 gives ~W*8/ep_len agent-steps
    per optimizer update, matching the episodic pair's granularity so
    the A/B isolates the continuous-batching semantics from the
    update-frequency difference)."""
    import numpy as np

    from dasa_tpu.train.trainer import World, make_agent

    if ":" in regime:
        mode, steps = regime.split(":")
        cfg = cfg.replace(rollout_mode=mode, stream_steps=int(steps))
    else:
        cfg = cfg.replace(rollout_mode=regime)
    world = World(cfg)
    agent = make_agent(cfg, world)
    train_env = world.envs["train"]
    assert agent.use_device_rollout()
    if regime == "stream":
        assert agent.use_stream_rollout()

    t0 = time.time()
    if agent.use_stream_rollout():
        agent.precompile_stream()
    else:
        agent.precompile_device()
    log(f"[{regime}] compile {time.time() - t0:.0f}s")

    def validate(steps):
        row = {"agent_steps": int(steps),
               "iters": int(agent.iter_count)}
        for env_name in ("val_seen", "val_unseen"):
            agent.env = world.envs[env_name]
            results = agent.test(feedback="argmax")
            summary, _ = world.evaluators[env_name].score(results)
            row[env_name] = {k: round(float(v), 4)
                             for k, v in summary.items()}
        agent.env = train_env
        log(f"[{regime}] steps={steps} it={agent.iter_count} "
            + " ".join(f"{e} SR={row[e]['success_rate']:.3f} "
                       f"SPL={row[e]['spl']:.3f}"
                       for e in ("val_seen", "val_unseen")))
        return row

    rows = [validate(0)]
    t0 = time.time()
    next_ms = 0
    while next_ms < len(milestones):
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()
        steps = agent.env_steps_total()
        if steps >= milestones[next_ms]:
            rows.append(validate(steps))
            next_ms += 1
    train_s = time.time() - t0
    log(f"[{regime}] trained {rows[-1]['agent_steps']} agent-steps / "
        f"{agent.iter_count} iters in {train_s:.0f}s (incl. "
        f"validations)")
    return {"regime": regime, "rows": rows, "train_seconds": train_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/task")
    ap.add_argument("--total_steps", type=int, default=600_000)
    ap.add_argument("--n_milestones", type=int, default=6)
    ap.add_argument("--fast", action="store_true",
                    help="tiny dims + CPU (plumbing smoke)")
    ap.add_argument("--regimes", default="episodic,stream")
    ap.add_argument("--seeds", default="1")
    ap.add_argument("--batch_size", type=int, default=20,
                    help="stream window width is 2*batch slots; 32 "
                         "tests the +6%% MXU-width geometry "
                         "(BENCH_NOTES.md round-4)")
    ap.add_argument("--out", default="/tmp/stream_ab.json")
    ap.add_argument("--lr", type=float, default=None,
                    help="override lr (sqrt(update-size ratio) rule "
                         "for the large-update arms)")
    ap.add_argument("--warm_steps", type=int, default=None)
    ap.add_argument("--decay_start", type=int, default=None)
    ap.add_argument("--decay_intervals", type=int, default=None)
    args = ap.parse_args()
    if args.fast:
        import jax

        jax.config.update("jax_platforms", "cpu")
        if args.total_steps > 2000:
            args.total_steps = 2000
            args.n_milestones = 2

    if not os.path.isdir(args.data_dir):
        raise SystemExit(f"{args.data_dir} missing — run "
                         f"scripts/make_task.py --out {args.data_dir}")

    milestones = [args.total_steps * (i + 1) // args.n_milestones
                  for i in range(args.n_milestones)]

    def log(msg):
        print(msg, flush=True)

    out = {"milestones": milestones, "runs": []}
    for seed in [int(s) for s in args.seeds.split(",")]:
        for regime in args.regimes.split(","):
            cfg = full_cfg(args).replace(seed=seed)
            run = run_regime(cfg, regime, milestones, log)
            run["seed"] = seed
            run["schedule"] = {"lr": cfg.lr,
                               "warm_steps": cfg.warm_steps,
                               "decay_start": cfg.decay_start,
                               "decay_intervals": cfg.decay_intervals,
                               "batch_size": cfg.batch_size}
            out["runs"].append(run)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)

    # markdown table for BENCH_NOTES.md: one row per (regime, seed)
    print("\n| regime | seed | " + " | ".join(
        f"{m // 1000}k seen/unseen SR" for m in [0] + milestones)
        + " | mean last-2 seen | mean last-2 unseen |")
    print("|" + "---|" * (4 + len(milestones)))
    for r in out["runs"]:
        cells = [f"{row['val_seen']['success_rate']:.3f}/"
                 f"{row['val_unseen']['success_rate']:.3f}"
                 for row in r["rows"]]
        last2 = r["rows"][-2:]
        m_seen = sum(x["val_seen"]["success_rate"]
                     for x in last2) / len(last2)
        m_unseen = sum(x["val_unseen"]["success_rate"]
                       for x in last2) / len(last2)
        print(f"| {r['regime']} | {r['seed']} | " + " | ".join(cells)
              + f" | {m_seen:.3f} | {m_unseen:.3f} |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
