#!/usr/bin/env python
"""Phase-level throughput profile of the headline bench workload on the
real TPU: times each jitted program (encode / act step / replay grads /
optimizer apply) separately, then full iterations.  Used to attribute
iteration time and MFU (BENCH_NOTES.md)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import expand_instructions, generate_synthetic_dataset
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

CONNECTIVITY = "/root/reference/connectivity"


def timeit(fn, n=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / n


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
    print(f"backend={jax.default_backend()}", flush=True)

    # --- trivial dispatch round-trip ---
    @jax.jit
    def triv(x):
        return x + 1

    x = jnp.zeros((4,))
    rtt = timeit(lambda: triv(x), n=20)
    print(f"trivial dispatch RTT: {rtt*1e3:.2f} ms", flush=True)

    t0 = time.time()
    agent.precompile_replay(cfg.batch_size)
    print(f"replay precompile: {time.time()-t0:.1f}s", flush=True)

    # --- phase pieces ---
    obs = env.reset()
    base_rng = agent._base_rng
    instr = jnp.asarray(obs.instr)
    valid = jnp.asarray(~obs.pad_mask)
    seq_len = jnp.asarray(obs.seq_len)
    enc = agent._encode_fn(True)
    t = timeit(lambda: enc(agent.params, instr, valid, seq_len, base_rng))
    print(f"encode_text (train): {t*1e3:.1f} ms", flush=True)
    cached = enc(agent.params, instr, valid, seq_len, base_rng)

    env_noise = agent._noise_fn()(base_rng)
    ended = np.zeros(cfg.batch_size, bool)
    sobs = agent._to_sobs(obs, ended, None, True)
    sobs_dev = {k: jnp.asarray(v) for k, v in sobs.items()}
    from dasa_tpu.models.policy import DecoderState, decoder_state_width
    dec_h = decoder_state_width(cfg)
    state = DecoderState(*(jnp.zeros((cfg.batch_size, dec_h),
                                     agent.dtype),) * 3)
    act = agent._act_fn("sample", True, True)
    t = timeit(lambda: act(agent.params, agent.tables, cached, valid,
                           seq_len, state, sobs_dev, 0, base_rng,
                           env_noise)[1])
    print(f"act step (device-synced): {t*1e3:.1f} ms", flush=True)

    # host-side act-step overhead: _to_sobs + H2D of the sobs dict
    def host_pack():
        s = agent._to_sobs(obs, ended, None, True)
        d = {k: jnp.asarray(v) for k, v in s.items()}
        jax.block_until_ready(d["logit_mask"])
        return d["logit_mask"]

    t = timeit(host_pack)
    print(f"host sobs build+H2D: {t*1e3:.1f} ms", flush=True)

    # --- replay grads per bucket ---
    use_noise = cfg.consistent_drop or cfg.self_train
    b, k, L = cfg.batch_size, cfg.max_candidates, cfg.max_input
    iv = jnp.ones((b, L), jnp.int32)
    vm = jnp.ones((b, L), bool)
    sl = jnp.full((b,), L, jnp.int32)

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

    for steps in sorted({min(8, cfg.max_action), cfg.max_action}):
        args = (iv, vm, sl, dummy_sobs(steps), dummy_sobs(),
                jnp.zeros((steps, b), jnp.float32),
                jnp.zeros((steps, b), jnp.float32),
                jnp.ones((b,), bool), jnp.zeros((b,), jnp.float32),
                base_rng, env_noise,
                jnp.asarray(0.2, jnp.float32), jnp.asarray(1.0, jnp.float32),
                jnp.asarray(0.01, jnp.float32))
        gfn = agent._grad_fn(use_noise, steps)
        t = timeit(lambda: gfn(agent.params, agent.tables, *args)[1]["loss"],
                   n=5)
        print(f"replay grad T={steps}: {t*1e3:.1f} ms", flush=True)
        grads, _ = gfn(agent.params, agent.tables, *args)

    t = timeit(lambda: agent._tree_add_fn()(
        jax.tree_util.tree_map(jnp.copy, grads), grads), n=5)
    print(f"grad tree-add: {t*1e3:.1f} ms", flush=True)

    # apply: measure with fresh copies each call since donation consumes
    def apply_once():
        p = jax.tree_util.tree_map(jnp.copy, agent.params)
        o = jax.tree_util.tree_map(jnp.copy, agent.opt_state)
        g = jax.tree_util.tree_map(jnp.copy, grads)
        jax.block_until_ready(p)
        t0 = time.time()
        out = agent._apply_fn()(p, o, g)
        jax.block_until_ready(out[0])
        return time.time() - t0

    apply_once()
    ts = [apply_once() for _ in range(5)]
    print(f"optimizer apply: {np.mean(ts)*1e3:.1f} ms", flush=True)

    # --- full iterations ---
    def one_iter():
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()

    one_iter()
    agent.total_env_steps = 0
    t0 = time.time()
    n = 8
    for _ in range(n):
        one_iter()
    jax.block_until_ready(agent.params["params"])
    dt = time.time() - t0
    print(f"full iter: {dt/n*1e3:.1f} ms/iter, "
          f"{agent.total_env_steps/dt:.1f} agent-steps/s", flush=True)


if __name__ == "__main__":
    main()
