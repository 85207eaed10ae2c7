"""Probe: can compiled TPU executables be serialized/deserialized on
the axon toolchain (jax.experimental.serialize_executable)?

If yes, bench warmup can snapshot its two rollout-grad executables to
disk and skip the multi-minute remote recompile on later runs (the
persistent JAX compile cache does not capture remote-compiled
executables here — BENCH_NOTES.md).  Run on the real chip:

    python scripts/try_aot_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend())

    @jax.jit
    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    x = jnp.ones((256, 512), jnp.bfloat16)
    w = jnp.ones((512, 1024), jnp.bfloat16)
    t0 = time.time()
    lowered = f.lower(x, w)
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s")

    try:
        from jax.experimental import serialize_executable as se
    except ImportError as e:
        print("NO serialize_executable module:", e)
        return
    try:
        t0 = time.time()
        blob, in_tree, out_tree = se.serialize(compiled)
        print(f"serialize ok: {len(blob)} bytes in "
              f"{time.time() - t0:.1f}s")
    except Exception as e:
        print("serialize FAILED:", type(e).__name__, e)
        return
    try:
        t0 = time.time()
        restored = se.deserialize_and_load(blob, in_tree, out_tree)
        out = restored(x, w)
        jax.block_until_ready(out)
        print(f"deserialize+run ok in {time.time() - t0:.1f}s; "
              f"out[0]={float(out[0]):.3f}")
    except Exception as e:
        print("deserialize FAILED:", type(e).__name__, e)


if __name__ == "__main__":
    main()
