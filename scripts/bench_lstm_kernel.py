"""Microbenchmark: Pallas lstm_scan vs XLA scan at the headline shapes.

Run on the TPU:  PYTHONPATH=/root/.axon_site:/root/repo python
scripts/bench_lstm_kernel.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from dasa_tpu.ops.lstm import lstm_scan, lstm_scan_ref


def main():
    T, B, H = 80, 20, 1024
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((T, B, 4 * H)) * 0.3, dtype)
    mask = jnp.ones((T, B), dtype)
    h0 = jnp.zeros((B, H), dtype)
    c0 = jnp.zeros((B, H), dtype)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, dtype)

    def loss_pallas(xw, h0, c0, wh):
        h_seq, c_seq = lstm_scan(xw, mask, h0, c0, wh, False)
        return (h_seq.astype(jnp.float32) ** 2).sum() + \
            c_seq[-1].astype(jnp.float32).sum()

    def loss_xla(xw, h0, c0, wh):
        h_seq, c_seq = lstm_scan_ref(xw, mask, h0, c0, wh)
        return (h_seq.astype(jnp.float32) ** 2).sum() + \
            c_seq[-1].astype(jnp.float32).sum()

    for name, fn in (("pallas", loss_pallas), ("xla", loss_xla)):
        g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2, 3)))
        t0 = time.time()
        out = g(xw, h0, c0, wh)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        # fwd-only too
        f = jax.jit(fn)
        jax.block_until_ready(f(xw, h0, c0, wh))
        n = 20
        t0 = time.time()
        for _ in range(n):
            out = g(xw, h0, c0, wh)
        jax.block_until_ready(out)
        grad_ms = (time.time() - t0) / n * 1e3
        t0 = time.time()
        for _ in range(n):
            o = f(xw, h0, c0, wh)
        jax.block_until_ready(o)
        fwd_ms = (time.time() - t0) / n * 1e3
        print(f"{name}: compile {compile_s:.1f}s  fwd {fwd_ms:.2f} ms  "
              f"fwd+grad {grad_ms:.2f} ms  loss {out[0]:.1f}")

    # numeric agreement at bf16
    vp, gp = jax.jit(jax.value_and_grad(loss_pallas))(xw, h0, c0, wh)
    vx, gx = jax.jit(jax.value_and_grad(loss_xla))(xw, h0, c0, wh)
    print("rel loss diff:", abs(float(vp) - float(vx)) / abs(float(vx)))
    print("rel dxw diff:",
          float(jnp.abs(gp.astype(jnp.float32) - gx.astype(jnp.float32)
                        ).max()))


if __name__ == "__main__":
    main()
