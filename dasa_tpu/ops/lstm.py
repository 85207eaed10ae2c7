"""Multi-token LSTM recurrence as a Pallas TPU kernel.

The DASA policy re-runs its top instruction BiLSTM every rollout step
(vision feeds the cross-modal encoder, so its output changes per step —
reference r2r_src/r2rmodel.py:2339-2357 re-encodes each step).  Under
XLA's scan lowering each of the T=80 tokens re-reads the (H, 4H)
recurrence weights from HBM (~8 MB/direction at the headline config),
making the recurrence bandwidth-bound at ~35% of the sampled training
pass (BENCH_NOTES.md device trace).

This kernel keeps the weights VMEM-resident across the whole token loop:

- grid = (T,): Pallas iterates tokens sequentially on-core; the weight
  block uses a constant index map so it is DMA'd into VMEM once and
  revisited, while per-token xw/mask blocks stream with double buffering.
- the (h, c) carry lives in f32 VMEM scratch, persisting across grid
  steps.
- forward also emits the gate activations (i, f, g, o); the backward
  kernel consumes them instead of re-deriving gates, so it needs ONE
  matmul per token (dgates @ wh^T) and the weight gradient collapses to
  a single (T*B, H) x (T*B, 4H) MXU contraction OUTSIDE the kernel — no
  per-token f32 partial accumulation, no dtype-convert reduction pass.

Masking matches dasa_tpu.models.layers.LSTM (PackedSequence semantics):
masked tokens pass the carry through and contribute zero gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(xw_ref, mask_ref, h0_ref, c0_ref, wh_ref,
                h_out, c_out, act_out, h_s, c_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    wh = wh_ref[:]
    gates = xw_ref[0].astype(jnp.float32) + jnp.dot(
        h_s[:].astype(wh.dtype), wh, preferred_element_type=jnp.float32)
    hd = h_s.shape[1]
    i = jax.nn.sigmoid(gates[:, :hd])
    f = jax.nn.sigmoid(gates[:, hd:2 * hd])
    g = jnp.tanh(gates[:, 2 * hd:3 * hd])
    o = jax.nn.sigmoid(gates[:, 3 * hd:])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    m = mask_ref[0]
    h_s[:] = m * h_new + (1.0 - m) * h_s[:]
    c_s[:] = m * c_new + (1.0 - m) * c_s[:]
    h_out[0] = h_s[:].astype(h_out.dtype)
    c_out[0] = c_s[:].astype(c_out.dtype)
    act_out[0] = jnp.concatenate([i, f, g, o], axis=-1).astype(act_out.dtype)


def _bwd_kernel(act_ref, cprev_ref, gh_ref, gc_ref, mask_ref, wh_ref,
                dxw_out, dh0_out, dc0_out, dh_s, dc_s):
    idx = pl.program_id(0)  # reverse time: block index maps select T-1-idx

    @pl.when(idx == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    acts = act_ref[0].astype(jnp.float32)
    hd = dh_s.shape[1]
    i = acts[:, :hd]
    f = acts[:, hd:2 * hd]
    g = acts[:, 2 * hd:3 * hd]
    o = acts[:, 3 * hd:]
    c_prev = cprev_ref[0].astype(jnp.float32)
    m = mask_ref[0]
    dh_tot = dh_s[:] + gh_ref[0].astype(jnp.float32)
    dc_tot = dc_s[:] + gc_ref[0].astype(jnp.float32)
    # h_t = m*h_new + (1-m)*h_prev: only the taken branch backpropagates
    dh_new = m * dh_tot
    dc_new = m * dc_tot
    c_new = f * c_prev + i * g
    tc = jnp.tanh(c_new)
    do = dh_new * tc
    dcn = dc_new + dh_new * o * (1.0 - tc * tc)
    dgates = jnp.concatenate(
        [(dcn * g) * i * (1.0 - i),
         (dcn * c_prev) * f * (1.0 - f),
         (dcn * i) * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)
    dxw_out[0] = dgates.astype(dxw_out.dtype)
    wh = wh_ref[:]
    # dgates @ wh^T without materializing the transpose: contract the
    # gate dims of both operands
    dh_prev = jax.lax.dot_general(
        dgates.astype(wh.dtype), wh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh_s[:] = (1.0 - m) * dh_tot + dh_prev
    dc_s[:] = (1.0 - m) * dc_tot + dcn * f

    @pl.when(idx == pl.num_programs(0) - 1)
    def _():
        dh0_out[:] = dh_s[:].astype(dh0_out.dtype)
        dc0_out[:] = dc_s[:].astype(dc0_out.dtype)


def _fwd_call(xw, mask, h0, c0, wh, interpret):
    t_len, b, g4 = xw.shape
    hd = wh.shape[0]
    flops = 2 * t_len * b * hd * g4 + 12 * t_len * b * g4
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t_len,),
        in_specs=[
            pl.BlockSpec((1, b, g4), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, b, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((b, hd), lambda t: (0, 0)),
            pl.BlockSpec((b, hd), lambda t: (0, 0)),
            pl.BlockSpec((hd, g4), lambda t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, b, hd), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, b, hd), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, b, g4), lambda t: (t, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, hd), xw.dtype),
            jax.ShapeDtypeStruct((t_len, b, hd), xw.dtype),
            jax.ShapeDtypeStruct((t_len, b, g4), xw.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, hd), jnp.float32),
            pltpu.VMEM((b, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xw.size + wh.size) * xw.dtype.itemsize,
            transcendentals=3 * t_len * b * g4,
        ),
        interpret=interpret,
    )(xw, mask[..., None], h0, c0, wh)


def _bwd_call(acts, c_prev, g_h, g_c, mask, wh, interpret):
    t_len, b, g4 = acts.shape
    hd = wh.shape[0]
    rev3 = lambda t: (t_len - 1 - t, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _bwd_kernel,
        grid=(t_len,),
        in_specs=[
            pl.BlockSpec((1, b, g4), rev3),
            pl.BlockSpec((1, b, hd), rev3),
            pl.BlockSpec((1, b, hd), rev3),
            pl.BlockSpec((1, b, hd), rev3),
            pl.BlockSpec((1, b, 1), rev3),
            pl.BlockSpec((hd, g4), lambda t: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, b, g4), rev3),
            pl.BlockSpec((b, hd), lambda t: (0, 0)),
            pl.BlockSpec((b, hd), lambda t: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_len, b, g4), acts.dtype),
            jax.ShapeDtypeStruct((b, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, hd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b, hd), jnp.float32),
            pltpu.VMEM((b, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * t_len * b * hd * g4 + 16 * t_len * b * g4,
            bytes_accessed=(2 * acts.size + wh.size) * acts.dtype.itemsize,
            transcendentals=t_len * b * hd,
        ),
        interpret=interpret,
    )(acts, c_prev, g_h, g_c, mask[..., None], wh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_scan(xw, mask, h0, c0, wh, interpret=None):
    """Masked LSTM recurrence with VMEM-resident weights.

    xw:   (T, B, 4H) precomputed input projection + bias (torch gate
          order i, f, g, o — models/layers.py LstmCell)
    mask: (T, B) float, 1.0 = valid token (masked steps pass the carry
          through; their emitted carry equals the previous one)
    h0, c0: (B, H) initial carry
    wh:   (H, 4H) recurrence weights

    Returns (h_seq, c_seq): the POST-MASK carry sequences, (T, B, H).
    The masked output stream is ``h_seq * mask[..., None]`` and the
    final carry is ``h_seq[-1] / c_seq[-1]`` (LSTM module contract).
    interpret=None auto-selects the interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h_seq, c_seq, _acts = _fwd_call(xw, mask, h0, c0, wh, interpret)
    return h_seq, c_seq


def _lstm_fwd(xw, mask, h0, c0, wh, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h_seq, c_seq, acts = _fwd_call(xw, mask, h0, c0, wh, interpret)
    return (h_seq, c_seq), (mask, h0, c0, wh, h_seq, c_seq, acts)


def _lstm_bwd(interpret, res, grads):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mask, h0, c0, wh, h_seq, c_seq, acts = res
    g_h, g_c = grads
    c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    dxw, dh0, dc0 = _bwd_call(acts, c_prev, g_h, g_c, mask, wh, interpret)
    # weight grad as ONE large MXU contraction over all (t, b) rows —
    # f32 accumulation straight out of the bf16 operands
    h_prev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    dwh = jax.lax.dot_general(
        h_prev, dxw,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(wh.dtype)
    return (dxw, jnp.zeros_like(mask), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype), dwh)


lstm_scan.defvjp(_lstm_fwd, _lstm_bwd)


def lstm_scan_ref(xw, mask, h0, c0, wh):
    """Pure-JAX reference of lstm_scan (f32 carry, same masking) for
    tests and non-TPU fallbacks."""
    def step(carry, xs):
        h, c = carry
        xw_t, m_t = xs
        gates = xw_t.astype(jnp.float32) + (
            h.astype(wh.dtype) @ wh).astype(jnp.float32)
        hd = h.shape[-1]
        i = jax.nn.sigmoid(gates[:, :hd])
        f = jax.nn.sigmoid(gates[:, hd:2 * hd])
        g = jnp.tanh(gates[:, 2 * hd:3 * hd])
        o = jax.nn.sigmoid(gates[:, 3 * hd:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), (h.astype(xw.dtype), c.astype(xw.dtype))

    (_h, _c), (h_seq, c_seq) = jax.lax.scan(
        step, (h0.astype(jnp.float32), c0.astype(jnp.float32)),
        (xw, mask))
    return h_seq, c_seq
