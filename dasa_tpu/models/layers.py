"""Core neural layers: LSTMs and the attention family.

Functional JAX re-design of the reference building blocks
(r2r_src/model.py:16-353): masked `lax.scan` LSTMs replace PackedSequence,
dropout takes explicit RNG, and shift attention's per-sample grouped conv
(model.py:300-353) becomes a static unrolled window sum that XLA fuses
into the surrounding softmax/weighted-sum — no batch-as-groups conv trick
needed on TPU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _uniform_symmetric(scale: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


NEG_INF = -1e9  # softmax mask value (finite to keep grads NaN-free)


class LstmCell(nn.Module):
    """LSTM cell with torch gate order (i, f, g, o) and uniform
    +-1/sqrt(H) init, so training dynamics and (later) checkpoint import
    match the reference's nn.LSTMCell.

    `input_proj` exposes the input->gates matmul separately so sequence
    LSTMs can hoist it out of the token scan: one (B*T, in)x(in, 4H)
    MXU-shaped matmul instead of T tiny ones, leaving only the
    hidden->hidden recurrence sequential."""

    features: int
    in_features: int
    dtype: Dtype = jnp.float32

    def setup(self):
        hidden = self.features
        k = 1.0 / math.sqrt(hidden)
        self.wi = self.param("wi", _uniform_symmetric(k),
                             (self.in_features, 4 * hidden))
        self.wh = self.param("wh", _uniform_symmetric(k),
                             (hidden, 4 * hidden))
        self.b = self.param("b", _uniform_symmetric(k), (4 * hidden,))

    def input_proj(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., in) -> (..., 4H) pre-activation from the input alone."""
        return x.astype(self.dtype) @ self.wi.astype(self.dtype)

    def step(self, carry: Tuple[jnp.ndarray, jnp.ndarray],
             xw: jnp.ndarray):
        """One recurrence step from a precomputed input projection."""
        h, c = carry
        gates = (
            xw
            + h.astype(self.dtype) @ self.wh.astype(self.dtype)
            + self.b.astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_h, new_c), new_h

    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray],
                 x: jnp.ndarray):
        return self.step(carry, self.input_proj(x))


class LSTM(nn.Module):
    """Masked unidirectional LSTM over (B, T, D).

    `mask` is True at *valid* positions; masked steps pass the carry
    through untouched and emit zeros, reproducing PackedSequence
    semantics: the final carry equals the state at each sequence's last
    valid token (and, run reversed, at its first)."""

    features: int
    reverse: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 init_carry=None, pallas: bool = False):
        batch = x.shape[0]
        if init_carry is None:
            zeros = jnp.zeros((batch, self.features), self.dtype)
            init_carry = (zeros, zeros)
        if self.reverse:
            x = jnp.flip(x, axis=1)
            mask = jnp.flip(mask, axis=1)

        cell = LstmCell(self.features, x.shape[-1], self.dtype)
        # hoisted input projection: ONE (B, T, in) x (in, 4H) matmul
        # feeds the MXU; the scan keeps only the hidden recurrence
        xw = cell.input_proj(x)

        if pallas:
            # VMEM-resident multi-token recurrence (ops/lstm.py): used by
            # the fused device programs where the token loop would
            # otherwise re-read the recurrence weights from HBM per token
            from dasa_tpu.ops.lstm import lstm_scan

            xw_t = jnp.swapaxes(xw + cell.b.astype(self.dtype), 0, 1)
            mask_t = jnp.swapaxes(mask, 0, 1).astype(self.dtype)
            h0, c0 = init_carry
            h_seq, c_seq = lstm_scan(xw_t, mask_t, h0, c0,
                                     cell.wh.astype(self.dtype))
            ys = jnp.swapaxes(h_seq * mask_t[..., None], 0, 1)
            carry = (h_seq[-1], c_seq[-1])
            if self.reverse:
                ys = jnp.flip(ys, axis=1)
            return ys, carry

        def step(cell, carry, xs):
            xw_t, m_t = xs
            new_carry, y = cell.step(carry, xw_t)
            m = m_t[:, None].astype(y.dtype)
            carry = jax.tree_util.tree_map(
                lambda new, old: m * new + (1 - m) * old, new_carry, carry)
            return carry, y * m

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=8,
        )
        carry, ys = scan(cell, init_carry, (xw, mask))
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys, carry


class BiLSTM(nn.Module):
    """Bidirectional masked LSTM; outputs concat(fwd, bwd) features and
    final states concat(bwd, fwd) matching torch's enc_h_t[-1],[-2] order
    (model.py:66-68).

    Both directions run as ONE fused scan over stacked (2, B) states
    (the backward direction consumes the time-flipped stream): half the
    sequential hidden-recurrence matmuls of two independent scans.  This
    recurrence dominates the per-step policy cost inside fused device
    rollouts — ablation in BENCH_NOTES.md — so the (2B)-row batched form
    matters more than it looks."""

    features: int  # per-direction hidden size
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, pallas: bool = False):
        feats = self.features
        cell_f = LstmCell(feats, x.shape[-1], self.dtype, name="fwd_cell")
        cell_b = LstmCell(feats, x.shape[-1], self.dtype, name="bwd_cell")
        x_rev = jnp.flip(x, axis=1)
        m_rev = jnp.flip(mask, axis=1)

        if pallas:
            # two independent VMEM-resident token scans (ops/lstm.py);
            # both directions' weights at once would exceed VMEM, and the
            # per-token matmul count matches the fused einsum scan
            from dasa_tpu.ops.lstm import lstm_scan

            batch = x.shape[0]
            zeros = jnp.zeros((batch, feats), self.dtype)

            def run(cell, xs, ms):
                xw1 = jnp.swapaxes(
                    cell.input_proj(xs) + cell.b.astype(self.dtype), 0, 1)
                m1 = jnp.swapaxes(ms, 0, 1).astype(self.dtype)
                h_seq, c_seq = lstm_scan(xw1, m1, zeros, zeros,
                                         cell.wh.astype(self.dtype))
                ys1 = jnp.swapaxes(h_seq * m1[..., None], 0, 1)
                return ys1, h_seq[-1], c_seq[-1]

            out_f, hf, cf = run(cell_f, x, mask)
            out_b_rev, hb, cb = run(cell_b, x_rev, m_rev)
            out_b = jnp.flip(out_b_rev, axis=1)
            ctx = jnp.concatenate([out_f, out_b], axis=-1)
            h_cat = jnp.concatenate([hb, hf], axis=-1)  # (bwd, fwd)
            c_cat = jnp.concatenate([cb, cf], axis=-1)
            return ctx, (h_cat, c_cat)
        # input projections stay hoisted: one (B*T)-row matmul each
        xw = jnp.stack([cell_f.input_proj(x),
                        cell_b.input_proj(x_rev)], 0)      # (2,B,T,4H)
        masks = jnp.stack([mask, m_rev], 0)                # (2,B,T)
        wh = jnp.stack([cell_f.wh, cell_b.wh], 0).astype(self.dtype)
        bias = jnp.stack([cell_f.b, cell_b.b], 0).astype(self.dtype)
        batch = x.shape[0]
        zeros = jnp.zeros((2, batch, feats), self.dtype)

        def step(carry, xs):
            h, c = carry
            xw_t, m_t = xs                                 # (2,B,4H)
            gates = (xw_t
                     + jnp.einsum("dbh,dhg->dbg",
                                  h.astype(self.dtype), wh)
                     + bias[:, None])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
            m = m_t[..., None].astype(new_h.dtype)
            return ((m * new_h + (1 - m) * h,
                     m * new_c + (1 - m) * c), new_h * m)

        # unroll: the per-token work is a (2B)-row matmul + elementwise —
        # loop overhead rivals compute, so give XLA 8 tokens per
        # iteration to schedule across
        (h_t, c_t), ys = jax.lax.scan(
            step, (zeros, zeros),
            (jnp.moveaxis(xw, 2, 0), jnp.moveaxis(masks, 2, 0)),
            unroll=8)
        out_f = jnp.moveaxis(ys[:, 0], 0, 1)               # (B,T,H)
        out_b = jnp.flip(jnp.moveaxis(ys[:, 1], 0, 1), axis=1)
        ctx = jnp.concatenate([out_f, out_b], axis=-1)
        h_cat = jnp.concatenate([h_t[1], h_t[0]], axis=-1)  # (bwd, fwd)
        c_cat = jnp.concatenate([c_t[1], c_t[0]], axis=-1)
        return ctx, (h_cat, c_cat)


class SoftDotAttention(nn.Module):
    """Classic dot attention (model.py:253-296).  `mask` True = masked.
    Returns (h_tilde or weighted_context, attn-or-logit)."""

    dim: int       # query dim
    ctx_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, context, mask=None, output_tilde: bool = True,
                 output_prob: bool = True):
        h = h.astype(self.dtype)
        context = context.astype(self.dtype)
        target = nn.Dense(self.ctx_dim, use_bias=False, dtype=self.dtype,
                          name="linear_in")(h)
        logit = jnp.einsum("btc,bc->bt", context, target)
        masked_logit = logit if mask is None else jnp.where(mask, NEG_INF, logit)
        attn = jax.nn.softmax(masked_logit, axis=-1)
        weighted = jnp.einsum("bt,btc->bc", attn, context)
        attn_out = attn if output_prob else logit
        if output_tilde:
            h_tilde = jnp.tanh(
                nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="linear_out")(
                    jnp.concatenate([weighted, h], axis=-1)))
            return h_tilde, attn_out
        return weighted, attn_out


class ShiftSoftDotAttention(nn.Module):
    """DASA shift attention over the 36-view panorama (model.py:300-353).

    The (B, 36) softmax attention is reshaped to 3 elevation rows x 12
    headings; a per-sample size-k kernel predicted from h smooths it with
    a circular convolution along the heading ring, and the smoothed
    attention re-weights the context.  The reference's batch-as-groups
    F.conv1d becomes k shifted adds (k<=5, static), which XLA fuses on the
    VPU — better than a grouped conv on the MXU at this size."""

    dim: int
    ctx_dim: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, h, context, mask=None, output_tilde: bool = True,
                 output_prob: bool = True):
        h = h.astype(self.dtype)
        context = context.astype(self.dtype)
        batch = h.shape[0]
        if self.use_pallas and mask is None:
            from dasa_tpu.ops.shift_attention import shift_attend

            w_in = self.param("linear_in/kernel",
                              nn.initializers.lecun_normal(),
                              (h.shape[-1], self.ctx_dim))
            w_s = self.param("linear_shift/kernel",
                             nn.initializers.lecun_normal(),
                             (h.shape[-1], self.kernel_size))
            b_s = self.param("linear_shift/bias", nn.initializers.zeros,
                             (self.kernel_size,))
            weighted, logit = shift_attend(h, context, w_in, w_s, b_s)
            attn_out = (jax.nn.softmax(logit, axis=-1) if output_prob
                        else logit)
            if output_tilde:
                h_tilde = jnp.tanh(
                    nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name="linear_out")(
                        jnp.concatenate(
                            [weighted.astype(self.dtype), h], axis=-1)))
                return h_tilde, attn_out
            return weighted.astype(self.dtype), attn_out
        target = nn.Dense(self.ctx_dim, use_bias=False, dtype=self.dtype,
                          name="linear_in")(h)
        logit = jnp.einsum("btc,bc->bt", context, target)
        masked_logit = logit if mask is None else jnp.where(mask, NEG_INF, logit)
        attn = jax.nn.softmax(masked_logit, axis=-1)

        n_views = attn.shape[1]
        assert n_views % 3 == 0, "shift attention expects 3 elevation rows"
        width = n_views // 3
        rows = attn.reshape(batch, 3, width)
        kernel = jax.nn.softmax(
            nn.Dense(self.kernel_size, dtype=self.dtype,
                     name="linear_shift")(h), axis=-1)  # (B, k)
        pad = self.kernel_size // 2
        ring = jnp.concatenate(
            [rows[:, :, -pad:], rows, rows[:, :, :pad]], axis=-1)
        # cross-correlation: out[pos] = sum_k ring[pos + k] * kernel[k]
        smoothed = sum(
            ring[:, :, k: k + width] * kernel[:, k][:, None, None]
            for k in range(self.kernel_size)
        )
        smoothed = smoothed.reshape(batch, n_views)
        weighted = jnp.einsum("bt,btc->bc", smoothed, context)
        attn_out = attn if output_prob else logit
        if output_tilde:
            h_tilde = jnp.tanh(
                nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="linear_out")(
                    jnp.concatenate([weighted, h], axis=-1)))
            return h_tilde, attn_out
        return weighted, attn_out


def scaled_dot_attention(value, key, query, mask=None,
                         output_prob: bool = True):
    """Single-head scaled dot-product attention with a (B, D) or
    (B, Lq, D) query (reference utils.py:627-657).  Returns
    (attended, attn-or-scores) squeezed back to the query's rank."""
    squeeze = query.ndim == 2
    if squeeze:
        query = query[:, None, :]
    d_k = query.shape[-1]
    scores = jnp.einsum("bqd,bkd->bqk", query, key) / math.sqrt(d_k)
    if mask is not None:
        scores = jnp.where(mask, NEG_INF, scores)
    att = jax.nn.softmax(scores, axis=-1)
    # quirk kept from the reference: with output_prob=False the RAW
    # scores weight the values too (utils.py:648-652)
    out_map = att if output_prob else scores
    result = jnp.einsum("bqk,bkd->bqd", out_map, value)
    if squeeze:
        return result[:, 0], out_map[:, 0]
    return result, out_map


class MLP(nn.Module):
    """Linear-ReLU-Linear (agent_dg.py:1550-1562)."""

    latent_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.latent_dim, dtype=self.dtype)(x.astype(self.dtype))
        x = nn.relu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)
