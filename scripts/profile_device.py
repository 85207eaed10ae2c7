#!/usr/bin/env python
"""Attribute device-rollout iteration time on the real TPU: times the
teacher-grad and sample-grad fused programs, grad tree-add, and the
optimizer apply separately, then full iterations (bench.py workload)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import numpy as np

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import expand_instructions, generate_synthetic_dataset
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

CONNECTIVITY = "/root/reference/connectivity"


def main():
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
        remat=os.environ.get("DASA_BENCH_REMAT", "auto"),
    )
    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    data = generate_synthetic_dataset(scans, 40,
                                      connectivity_dir=CONNECTIVITY,
                                      min_hops=4, max_hops=6)
    vocab = build_vocab(data, min_count=1)
    tok = Tokenizer(vocab, encoding_length=cfg.max_input)
    items = expand_instructions(data, tok, max_input=cfg.max_input)
    feature_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=cfg.feature_size)
    depth_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=cfg.feature_size,
                                   salt=7)
    env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                 connectivity_dir=CONNECTIVITY,
                 max_candidates=cfg.max_candidates,
                 max_input=cfg.max_input, depth_db=depth_db)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))
    assert agent.use_device_rollout()
    print(f"backend={jax.default_backend()}", flush=True)

    def timed_pass(label, fn, n=10, warmup=1):
        # NOTE: through the axon tunnel block_until_ready can return
        # before remote work completes; a VALUE FETCH that depends on
        # the final dispatch is the only trustworthy fence (bench.py).
        for _ in range(warmup):
            agent.zero_grad()
            fn()
            float(np.asarray(agent.losses[-1]))
        agent.zero_grad()
        t0 = time.time()
        for _ in range(n):
            fn()
        float(np.asarray(agent.losses[-1]))
        dt = (time.time() - t0) / n
        steps = agent.env_steps_total()
        agent._env_steps_log = []
        agent.total_env_steps = 0
        print(f"{label}: {dt*1e3:.1f} ms/dispatch "
              f"({steps/max(n,1):.0f} agent-steps each)", flush=True)
        return dt

    t0 = time.time()
    agent.zero_grad()
    agent.device_rollout(train_ml=0.2, train_rl=False, feedback="teacher")
    jax.block_until_ready(agent._grad_accum)
    print(f"teacher compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    agent.device_rollout(train_ml=None, train_rl=True, feedback="sample")
    jax.block_until_ready(agent._grad_accum)
    print(f"sample compile+run: {time.time()-t0:.1f}s", flush=True)

    t_teacher = timed_pass(
        "teacher grad", lambda: agent.device_rollout(
            train_ml=0.2, train_rl=False, feedback="teacher"))
    t_sample = timed_pass(
        "sample grad", lambda: agent.device_rollout(
            train_ml=None, train_rl=True, feedback="sample"))

    # grad tree-add (second accumulate in a pass pays this)
    agent.zero_grad()
    agent.device_rollout(train_ml=0.2, train_rl=False, feedback="teacher")
    g = agent._grad_accum
    jax.block_until_ready(g)
    add = agent._tree_add_fn()
    gc = jax.tree_util.tree_map(lambda x: x + 0, g)
    jax.block_until_ready(gc)
    t0 = time.time()
    for _ in range(10):
        gc = add(gc, g)
    float(jax.tree_util.tree_leaves(gc)[0].ravel()[0])  # value fence
    print(f"tree-add: {(time.time()-t0)/10*1e3:.1f} ms", flush=True)

    def apply_once():
        p = jax.tree_util.tree_map(lambda x: x + 0, agent.params)
        o = jax.tree_util.tree_map(lambda x: x + 0, agent.opt_state)
        gg = jax.tree_util.tree_map(lambda x: x + 0, g)
        float(jax.tree_util.tree_leaves(p)[0].ravel()[0])
        t0 = time.time()
        out = agent._apply_fn()(p, o, gg)
        float(jax.tree_util.tree_leaves(out[0])[0].ravel()[0])
        return time.time() - t0

    apply_once()
    ts = [apply_once() for _ in range(5)]
    print(f"optimizer apply: {np.mean(ts)*1e3:.1f} ms", flush=True)

    # full iterations, bench-style
    def one_iter():
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()

    one_iter()
    float(np.asarray(agent.losses[-1]))
    agent._env_steps_log = []
    agent.total_env_steps = 0
    t0 = time.time()
    n = 10
    for _ in range(n):
        one_iter()
    float(np.asarray(agent.losses[-1]))  # value-fetch fence (bench.py)
    dt = time.time() - t0
    steps = agent.env_steps_total()
    print(f"full iter: {dt/n*1e3:.1f} ms/iter, {steps/dt:.1f} agent-steps/s",
          flush=True)


if __name__ == "__main__":
    main()
