#!/usr/bin/env python
"""Probe: how does the fused sample-pass rollout-grad program scale
with batch width?

Round-3 trace (BENCH_NOTES.md) showed the sample scan costs ~7.3 ms per
executed step at batch 20 — suspiciously close to the 160-row teacher
replay's per-step cost, suggesting the per-step cost is dominated by
weight traffic / MXU row-padding waste rather than by batch rows.  If
batch 40-80 steps cost ~the same as batch 20 steps, then processing the
teacher and sample passes as ONE wider program (and, eventually,
continuous batching) converts the waste directly into throughput.

Times the SAMPLE fused grad program only (the scan whose width we'd
grow), at batch sizes given by --batches, on the pinned bench fixture
with bench-identical model config.  Prints steps/s and ms/call per
batch size.

Usage (TPU, ~10 min compile per batch size through the axon tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/probe_batch_scaling.py --batches 20,40,80 --iters 6
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

CONNECTIVITY = "/root/reference/connectivity"
FIXTURE = "/root/repo/data/bench_fixture.json"


def build_cfg(batch_size: int):
    from dasa_tpu.config import Config
    return Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", angle_feat_size=128,
        feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
        critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
        max_action=35, batch_size=batch_size, featdropout=0.4,
        optim="rms", lr=1e-4, use_lr_scheduler=True, ml_weight=0.2,
        connectivity_dir=CONNECTIVITY, compute_dtype="bfloat16",
        remat=os.environ.get("DASA_BENCH_REMAT", "never"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="20,40,80")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import numpy as np

    from dasa_tpu.agents import Seq2SeqAgent
    from dasa_tpu.data.datasets import expand_instructions
    from dasa_tpu.data.features import FeatureDB
    from dasa_tpu.env import R2REnv
    from dasa_tpu.utils import Tokenizer, build_vocab

    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    with open(FIXTURE) as f:
        data = json.load(f)

    feature_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=2048)
    depth_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=2048, salt=7)

    results = []
    for bs in [int(x) for x in args.batches.split(",")]:
        cfg = build_cfg(bs)
        vocab = build_vocab(data, min_count=1)
        tok = Tokenizer(vocab, encoding_length=cfg.max_input)
        items = expand_instructions(data, tok, max_input=cfg.max_input)
        env = R2REnv(feature_db, items, batch_size=bs,
                     connectivity_dir=CONNECTIVITY,
                     max_candidates=cfg.max_candidates,
                     max_input=cfg.max_input, depth_db=depth_db)
        agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                             vocab_size=len(tok))
        try:
            t0 = time.time()
            agent.zero_grad()
            agent.device_rollout(train_ml=None, train_rl=True,
                                 feedback="sample")
            float(np.asarray(agent.losses[-1]))
            compile_s = time.time() - t0

            agent._env_steps_log = []
            t0 = time.time()
            for _ in range(args.iters):
                agent.zero_grad()  # fresh grads: times the non-acc fn
                agent.device_rollout(train_ml=None, train_rl=True,
                                     feedback="sample")
            final = float(np.asarray(agent.losses[-1]))
            dt = time.time() - t0
            steps = sum(int(x) for x in agent._env_steps_log)
            row = {"batch": bs, "steps_per_sec": round(steps / dt, 1),
                   "ms_per_call": round(1e3 * dt / args.iters, 1),
                   "steps_per_call": round(steps / args.iters, 1),
                   "compile_s": round(compile_s, 1),
                   "final_loss": round(final, 3)}
        except Exception as e:  # OOM at wide batches is a finding too
            row = {"batch": bs, "error": repr(e)[:300]}
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "batch_scaling", "rows": results}))


if __name__ == "__main__":
    main()
