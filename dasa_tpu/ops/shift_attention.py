"""Fused shift attention over the 36-view panorama (Pallas TPU kernel).

One kernel computes, per batch row: attention logits against the query
projection, a masked softmax, the per-sample circular kernel smoothing
over the (3, 12) elevation x heading grid, and the smoothed weighted sum
of the context — keeping the (36, F) context block in VMEM for the whole
pipeline instead of four XLA op round trips.  Semantics match
ShiftSoftDotAttention (reference: r2r_src/model.py:300-353).

Backward is plain XLA via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def shift_smooth(attn, kernel, width: int = 12):
    """(B, 3*width) attention, (B, k) per-sample kernel -> smoothed by
    circular cross-correlation along the heading ring."""
    b, n = attn.shape
    ks = kernel.shape[1]
    pad = ks // 2
    rows = attn.reshape(b, n // width, width)
    ring = jnp.concatenate([rows[:, :, -pad:], rows, rows[:, :, :pad]],
                           axis=-1)
    out = sum(ring[:, :, i: i + width] * kernel[:, i][:, None, None]
              for i in range(ks))
    return out.reshape(b, n)


def _reference(h, ctx, w_in, w_shift, b_shift):
    target = h @ w_in
    logit = jnp.einsum("btc,bc->bt", ctx, target)
    attn = jax.nn.softmax(logit, axis=-1)
    kernel = jax.nn.softmax(h @ w_shift + b_shift, axis=-1)
    smoothed = shift_smooth(attn, kernel)
    weighted = jnp.einsum("bt,btc->bc", smoothed, ctx)
    return weighted, logit


def _kernel_body(h_ref, ctx_ref, win_ref, wshift_ref, bshift_ref,
                 out_ref, logit_ref, ks: int):
    """One batch row per grid program; every op is rank-2 so Mosaic can
    lower it (batched 3D dot_generals are rejected)."""
    h = h_ref[:].astype(jnp.float32)            # (1, H)
    ctx = ctx_ref[0].astype(jnp.float32)        # (T, C)
    target = jnp.dot(h, win_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)   # (1, C)
    logit = jnp.dot(ctx, target.T,
                    preferred_element_type=jnp.float32).T  # (1, T)
    logit_ref[:] = logit.astype(logit_ref.dtype)
    attn = jax.nn.softmax(logit, axis=-1)
    kern = jax.nn.softmax(
        jnp.dot(h, wshift_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + bshift_ref[:].astype(jnp.float32), axis=-1)      # (1, ks)
    n = attn.shape[1]
    width = n // 3
    pad = ks // 2
    rows = attn.reshape(3, width)
    ring = jnp.concatenate([rows[:, -pad:], rows, rows[:, :pad]], axis=-1)
    sm = rows * 0.0
    for i in range(ks):
        sm = sm + ring[:, i: i + width] * kern[0, i]
    out_ref[:] = jnp.dot(sm.reshape(1, n), ctx,
                         preferred_element_type=jnp.float32
                         ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def shift_attend(h, ctx, w_in, w_shift, b_shift, interpret=False):
    """Fused shift attention.  h (B, H); ctx (B, T, C) with T % 3 == 0;
    w_in (H, C); w_shift (H, k); b_shift (k,).
    Returns (weighted_context (B, C), raw logits (B, T))."""
    b, t, c = ctx.shape
    hd = h.shape[1]
    ks = w_shift.shape[1]
    out, logit = pl.pallas_call(
        functools.partial(_kernel_body, ks=ks),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hd), lambda i: (i, 0)),
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((hd, c), lambda i: (0, 0)),
            pl.BlockSpec((hd, ks), lambda i: (0, 0)),
            pl.BlockSpec((1, ks), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, c), lambda i: (i, 0)),
                   pl.BlockSpec((1, t), lambda i: (i, 0))),
        out_shape=(jax.ShapeDtypeStruct((b, c), ctx.dtype),
                   jax.ShapeDtypeStruct((b, t), jnp.float32)),
        interpret=interpret,
    )(h, ctx, w_in, w_shift, b_shift.reshape(1, ks))
    return out, logit


def _fwd(h, ctx, w_in, w_shift, b_shift, interpret):
    out = shift_attend(h, ctx, w_in, w_shift, b_shift, interpret)
    return out, (h, ctx, w_in, w_shift, b_shift)


def _bwd(interpret, res, grads):
    h, ctx, w_in, w_shift, b_shift = res

    def fwd_fn(h, ctx, w_in, w_shift, b_shift):
        target = (h.astype(jnp.float32)
                  @ w_in.astype(jnp.float32))
        logit = jnp.einsum("btc,bc->bt", ctx.astype(jnp.float32), target)
        attn = jax.nn.softmax(logit, axis=-1)
        kern = jax.nn.softmax(
            h.astype(jnp.float32) @ w_shift.astype(jnp.float32)
            + b_shift.astype(jnp.float32), axis=-1)
        sm = shift_smooth(attn, kern)
        weighted = jnp.einsum("bt,btc->bc", sm, ctx.astype(jnp.float32))
        return weighted.astype(ctx.dtype), logit.astype(jnp.float32)

    _, vjp = jax.vjp(fwd_fn, h, ctx, w_in, w_shift, b_shift)
    return vjp(grads)


shift_attend.defvjp(_fwd, _bwd)
