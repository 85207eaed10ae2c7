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


def _shift_perm_matrix(n: int, ks: int, width: int = 12):
    """(ks*n, n) stack of permutation matrices: P_k maps attention slot
    t = e*width + pos to slot e*width + (pos + k - ks//2) mod width —
    the circular heading shift as a matmul (the (3, 12) grid reshape is
    not Mosaic-lowerable, a constant permutation matmul is)."""
    import numpy as _np

    pad = ks // 2
    perms = _np.zeros((ks * n, n), _np.float32)
    for k in range(ks):
        for t in range(n):
            e, pos = divmod(t, width)
            src = e * width + (pos + k - pad) % width
            # out[t] sums attn[src] * kern[k]
            perms[k * n + src, t] = 1.0
    return perms


def _kernel_body(h_ref, ctx_ref, win_ref, wshift_ref, bshift_ref,
                 perm_ref, out_ref, logit_ref, ks: int):
    """Single program, statically unrolled over batch rows: every slice
    index is static, every op rank-2, and the circular-shift smoothing
    is a constant permutation matmul — the shapes Mosaic can lower
    (batched 3D dot_generals, 1-row dynamic sublane slices, and
    lane-merging reshapes are all rejected)."""
    b = h_ref.shape[0]
    n = logit_ref.shape[1]
    # keep the large operands in their storage dtype (bf16): f32 copies
    # of ctx/w_in alone would blow the 16MB VMEM budget; the MXU
    # accumulates in f32 via preferred_element_type
    w_in = win_ref[:]
    w_shift = wshift_ref[:]
    b_shift = bshift_ref[:].astype(jnp.float32)
    for j in range(b):
        h = h_ref[j:j + 1, :]                            # (1, H)
        ctx = ctx_ref[j]                                 # (T, C)
        target = jnp.dot(h, w_in,
                         preferred_element_type=jnp.float32)   # (1, C)
        logit = jnp.dot(ctx.astype(jnp.float32), target.T,
                        preferred_element_type=jnp.float32).T  # (1, T)
        logit_ref[j:j + 1, :] = logit.astype(logit_ref.dtype)
        attn = jax.nn.softmax(logit, axis=-1)                  # (1, T)
        kern = jax.nn.softmax(
            jnp.dot(h, w_shift, preferred_element_type=jnp.float32)
            + b_shift, axis=-1)                                # (1, ks)
        sm = attn * 0.0
        for k in range(ks):
            p_k = perm_ref[k * n:(k + 1) * n, :]
            sm = sm + kern[0, k] * jnp.dot(
                attn, p_k, preferred_element_type=jnp.float32)
        out_ref[j:j + 1, :] = jnp.dot(
            sm.astype(ctx.dtype), ctx,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def shift_attend(h, ctx, w_in, w_shift, b_shift, interpret=None):
    """Fused shift attention.  h (B, H); ctx (B, T, C) with T % 3 == 0;
    w_in (H, C); w_shift (H, k); b_shift (k,).
    Returns (weighted_context (B, C), raw logits (B, T)).
    interpret=None auto-selects the interpreter off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, c = ctx.shape
    hd = h.shape[1]
    ks = w_shift.shape[1]
    perms = jnp.asarray(_shift_perm_matrix(t, ks))
    out, logit = pl.pallas_call(
        functools.partial(_kernel_body, ks=ks),
        out_shape=(jax.ShapeDtypeStruct((b, c), ctx.dtype),
                   jax.ShapeDtypeStruct((b, t), jnp.float32)),
        interpret=interpret,
    )(h, ctx, w_in, w_shift, b_shift.reshape(1, ks), perms)
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
