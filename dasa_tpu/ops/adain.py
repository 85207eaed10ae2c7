"""Fused depth-guided AdaIN channel gate (Pallas TPU kernel).

Computes out = sigmoid(d @ W + b) * f [* noise] in one pass: the gate
matmul runs on the MXU while the modulation and the consistent env-drop
mask fuse on the VPU, so the (B*36, 2048) panorama tensors make a single
HBM round trip instead of three (gate, multiply, drop as separate ops).
Semantics match DGAdaChannel with ab_type='a', a_type='sigmoid' — the
published DASA config (reference: agent_dg.py:1513-1547, README.md:86) —
composed with the env-drop noise multiply (agent_dg.py:780-785).

Backward runs as plain XLA via custom_vjp (the training step is
scan-fused anyway); the kernel is the inference/acting hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(f, d, w, b, noise):
    gate = jax.nn.sigmoid(
        jnp.einsum("nc,ck->nk", d, w,
                   preferred_element_type=jnp.float32).astype(f.dtype)
        + b)
    out = gate * f
    if noise is not None:
        out = out * noise
    return out


def _kernel(d_ref, f_ref, w_ref, b_ref, noise_ref, out_ref, acc_ref):
    """Grid: (row_tiles, k_tiles_of_C).  Accumulate d-tile @ w-tile into
    the f32 scratch; on the last k step apply sigmoid * f * noise."""
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(d_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        gate = jax.nn.sigmoid(acc_ref[:] + b_ref[:].astype(jnp.float32))
        out = gate * f_ref[:].astype(jnp.float32)
        out = out * noise_ref[:].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)


def _pallas_forward(f2, d2, w, b, noise, interpret):
    n, c = f2.shape
    row_tile = min(256, n)
    k_tile = min(512, c)
    grid = (pl.cdiv(n, row_tile), pl.cdiv(c, k_tile))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, k_tile), lambda i, k: (i, k)),  # d
            pl.BlockSpec((row_tile, c), lambda i, k: (i, 0)),       # f
            pl.BlockSpec((k_tile, c), lambda i, k: (k, 0)),         # w
            pl.BlockSpec((1, c), lambda i, k: (0, 0)),              # b
            pl.BlockSpec((1, c), lambda i, k: (0, 0)),              # noise
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), f2.dtype),
        scratch_shapes=[pltpu.VMEM((row_tile, c), jnp.float32)],
        interpret=interpret,
    )(d2, f2, w, b.reshape(1, c), noise.reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def adain_channel_gate(f, d, w, b, noise=None, interpret=None):
    """out = sigmoid(d @ w + b) * f * noise.

    f, d: (..., C); w: (C, C); b: (C,); noise: (C,) or None.
    interpret=None auto-selects the interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = f.shape
    c = shape[-1]
    f2 = f.reshape(-1, c)
    d2 = d.reshape(-1, c)
    nz = jnp.ones((c,), f.dtype) if noise is None else noise.astype(f.dtype)
    out = _pallas_forward(f2, d2, w.astype(f.dtype), b.astype(f.dtype),
                          nz, interpret)
    return out.reshape(shape)


def _fwd(f, d, w, b, noise, interpret):
    out = adain_channel_gate(f, d, w, b, noise, interpret)
    return out, (f, d, w, b, noise)


def _bwd(interpret, res, g):
    f, d, w, b, noise = res
    c = f.shape[-1]
    f2 = f.reshape(-1, c).astype(jnp.float32)
    d2 = d.reshape(-1, c).astype(jnp.float32)
    g2 = g.reshape(-1, c).astype(jnp.float32)
    nz = (jnp.ones((c,), jnp.float32) if noise is None
          else noise.reshape(-1).astype(jnp.float32))
    z = d2 @ w.astype(jnp.float32) + b.astype(jnp.float32)
    s = jax.nn.sigmoid(z)
    gn = g2 * nz
    df = (gn * s).astype(f.dtype).reshape(f.shape)
    dz = gn * f2 * s * (1.0 - s)
    dd = (dz @ w.astype(jnp.float32).T).astype(d.dtype).reshape(d.shape)
    dw = (d2.T @ dz).astype(w.dtype)
    db = dz.sum(0).astype(b.dtype)
    dnoise = (None if noise is None
              else (g2 * s * f2).sum(0).astype(noise.dtype))
    return df, dd, dw, db, dnoise


adain_channel_gate.defvjp(_fwd, _bwd)
