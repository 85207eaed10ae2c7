#!/usr/bin/env python
"""Headline benchmark: DASA training throughput on one TPU chip.

Runs the full-size DASA config (reference README.md:82-98) at batchSize
20 on synthetic features over real connectivity graphs, times steady-
state optimizer iterations (teacher + sample rollout, grad accumulation,
RMSProp update), and prints ONE JSON line:

    {"metric": "agent_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N}

See BENCH_NOTES.md for the agent-step definition and the reference
baseline estimate.
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

REF_AGENT_STEPS_PER_SEC = 135.0  # BENCH_NOTES.md

CONNECTIVITY = "/root/reference/connectivity"


def main():
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
    cfg = Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", angle_feat_size=128,
        feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
        critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
        max_action=35, batch_size=20, featdropout=0.4, optim="rms",
        lr=1e-4, use_lr_scheduler=True, ml_weight=0.2,
        connectivity_dir=CONNECTIVITY,
        compute_dtype="bfloat16",
    )
    if fast:  # plumbing smoke for CPU runs, not a benchmark
        cfg = cfg.replace(d_la_layers=1, d_vl_layers=1, batch_size=4,
                          max_action=6, feature_size=64, angle_feat_size=8,
                          d_enc_hidden_size=32, d_hidden_size=64,
                          critic_dim=64, max_input=24,
                          compute_dtype="float32")

    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    data = generate_synthetic_dataset(scans, 40,
                                      connectivity_dir=CONNECTIVITY,
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

    def one_iter():
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()

    # warmup: compile every replay bucket + act/update programs
    t0 = time.time()
    agent.precompile_replay(cfg.batch_size)
    one_iter()
    warm = time.time() - t0

    # timed window: >=20 iterations so episode-length variation averages
    # out; per-iteration rates give the spread (round-over-round deltas
    # should be attributable to code, not episode luck)
    n_iters = 2 if fast else 20
    rates = []
    agent.total_env_steps = 0
    t0 = time.time()
    for _ in range(n_iters):
        before_steps = agent.total_env_steps
        t1 = time.time()
        one_iter()
        rates.append((agent.total_env_steps - before_steps)
                     / (time.time() - t1))
    dt = time.time() - t0
    steps_per_sec = agent.total_env_steps / dt

    result = {
        "metric": "agent_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_AGENT_STEPS_PER_SEC, 3),
    }
    print(json.dumps(result))
    print(f"# warmup(compile)={warm:.1f}s, timed {n_iters} iters in "
          f"{dt:.1f}s, {agent.total_env_steps} agent-steps, "
          f"per-iter {np.mean(rates):.1f}+-{np.std(rates):.1f} steps/s "
          f"(min {min(rates):.1f}, max {max(rates):.1f}), backend="
          f"{__import__('jax').default_backend()}", file=sys.stderr)


if __name__ == "__main__":
    main()
