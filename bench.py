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
        # the headline config's 35-step fused scan fits HBM without
        # rematerialization; skipping the backward recompute measured
        # 817 -> 1125 agent-steps/s (BENCH_NOTES.md).  Config default
        # stays "auto" (remat when >16 steps) as the safe setting for
        # larger models.
        remat=os.environ.get("DASA_BENCH_REMAT", "never"),
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

    # warmup: compile the programs the timed loop will use (device path:
    # the two rollout-grad programs, compiled concurrently, + tree-add
    # + apply)
    t0 = time.time()
    if agent.use_device_rollout():
        agent.precompile_device()
    else:
        agent.precompile_replay(cfg.batch_size)
    one_iter()
    float(np.asarray(agent.losses[-1]))  # force through the async queue
    warm = time.time() - t0

    # timed window: >=20 iterations so episode-length variation averages
    # out.  The loop itself fetches NOTHING (device dispatch is async and
    # the fused rollouts never sync); the clock stops on a value fetch
    # that depends on the final iteration's work, so queued work cannot
    # leak out of the window.
    n_iters = 2 if fast else 20
    agent.total_env_steps = 0
    agent._env_steps_log = []
    t0 = time.time()
    for _ in range(n_iters):
        one_iter()
    final_sync = float(np.asarray(agent.losses[-1]))
    dt = time.time() - t0
    per_iter_steps = [int(x) for x in agent._env_steps_log]
    total_steps = agent.env_steps_total()
    steps_per_sec = total_steps / dt

    result = {
        "metric": "agent_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_AGENT_STEPS_PER_SEC, 3),
    }
    print(json.dumps(result))
    rollouts_per_iter = max(1, len(per_iter_steps) // n_iters)
    iters = [sum(per_iter_steps[i:i + rollouts_per_iter])
             for i in range(0, len(per_iter_steps), rollouts_per_iter)]
    print(f"# warmup(compile)={warm:.1f}s, timed {n_iters} iters in "
          f"{dt:.1f}s, {total_steps} agent-steps "
          f"(per-iter steps min {min(iters) if iters else 0} / "
          f"max {max(iters) if iters else 0}), final_loss={final_sync:.3f},"
          f" backend={__import__('jax').default_backend()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
