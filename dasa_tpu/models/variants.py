"""Ablation-variant building blocks and decoders.

References: r2r_src/dyrelu.py (LangDyReLU{A,B,C}: piecewise-linear
activations whose slopes/intercepts are predicted from the language
query), r2r_src/fusion.py (MLB hadamard fusion, Mutan low-rank bilinear
fusion), model.py:934-968 (DoubleBAttnDecoderLSTM: parallel RGB + depth
decoders with summed candidate logits), model.py:578-931 (Advanced /
KVMem / New / Mutan variant decoders), model.py:1505-1591 (McattDecoder),
model.py:1609-1707 (MTDecoder).  These power the reference's
agent_{dyrelu,mutan,double,advanced,kvmem,new,mcatt,mt} ablations
(train.py:24-46).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.decoder import BAttnDecoderLSTM, drop_visual
from dasa_tpu.models.layers import (
    LstmCell,
    SoftDotAttention,
    scaled_dot_attention,
)

Dtype = Any


class LangDyReLU(nn.Module):
    """Base: predict 2k piecewise-linear coefficients from the query.

    out = max_j (x * a_j + b_j) with (a, b) = lambdas * theta + init
    (dyrelu.py:4-30)."""

    channels: int
    reduction: int = 4
    k: int = 2
    per_channel: bool = False   # B variant: coefs per channel
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, q):
        """x (..., C) applied along the last axis; q (B, Q)."""
        k = self.k
        out_dim = 2 * k * (self.channels if self.per_channel else 1)
        theta = nn.Dense(self.channels // self.reduction,
                         dtype=self.dtype, name="fc1")(q.astype(self.dtype))
        theta = nn.relu(theta)
        theta = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(theta)
        theta = 2 * jax.nn.sigmoid(theta) - 1
        lambdas = jnp.asarray([1.0] * k + [0.5] * k, self.dtype)
        init_v = jnp.asarray([1.0] + [0.0] * (2 * k - 1), self.dtype)
        if self.per_channel:
            coefs = theta.reshape(-1, self.channels, 2 * k)
        else:
            coefs = theta.reshape(-1, 1, 2 * k)
        coefs = coefs * lambdas + init_v                 # (B, C|1, 2k)
        b = coefs.shape[0]
        x2 = x.reshape(b, -1, x.shape[-1])               # (B, L, C)
        a_part = coefs[:, None, :, :k]                   # (B, 1, C|1, k)
        b_part = coefs[:, None, :, k:]
        out = x2[..., None] * a_part + b_part            # (B, L, C, k)
        return jnp.max(out, axis=-1).reshape(x.shape)


def lang_dyrelu_a(channels, reduction=4, k=2, dtype=jnp.float32):
    """Shared coefficients across channels (dyrelu.py:33-49)."""
    return LangDyReLU(channels, reduction, k, per_channel=False,
                      dtype=dtype)


def lang_dyrelu_c(channels, reduction=4, k=2, dtype=jnp.float32):
    """Per-channel coefficients on (B, L, C) inputs (dyrelu.py:82-105;
    the B variant differs only in input layout)."""
    return LangDyReLU(channels, reduction, k, per_channel=True,
                      dtype=dtype)


class MLBFusion(nn.Module):
    """Multimodal low-rank bilinear: hadamard of projected streams
    (fusion.py:17-51)."""

    dim_h: int
    dropout_v: float = 0.5
    dropout_q: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, q, *, deterministic: bool = True):
        v = nn.Dropout(self.dropout_v)(v.astype(self.dtype),
                                       deterministic=deterministic)
        v = jnp.tanh(nn.Dense(self.dim_h, dtype=self.dtype,
                              name="linear_v")(v))
        q = nn.Dropout(self.dropout_q)(q.astype(self.dtype),
                                       deterministic=deterministic)
        q = jnp.tanh(nn.Dense(self.dim_h, dtype=self.dtype,
                              name="linear_q")(q))
        return v * q


class MutanFusion(nn.Module):
    """Tucker-decomposed bilinear fusion: sum of R rank-1 hadamard
    interactions (fusion.py:54-120)."""

    dim_hv: int
    dim_hq: int
    dim_mm: int
    rank: int = 5
    dropout_v: float = 0.5
    dropout_q: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, q, *, deterministic: bool = True):
        v = nn.Dropout(self.dropout_v)(v.astype(self.dtype),
                                       deterministic=deterministic)
        v = jnp.tanh(nn.Dense(self.dim_hv, dtype=self.dtype,
                              name="linear_v")(v))
        q = nn.Dropout(self.dropout_q)(q.astype(self.dtype),
                                       deterministic=deterministic)
        q = jnp.tanh(nn.Dense(self.dim_hq, dtype=self.dtype,
                              name="linear_q")(q))
        total = 0.0
        for r in range(self.rank):
            hv = nn.Dense(self.dim_mm, dtype=self.dtype,
                          name=f"linear_hv_{r}")(v)
            hq = nn.Dense(self.dim_mm, dtype=self.dtype,
                          name=f"linear_hq_{r}")(q)
            total = total + hv * hq
        return jnp.tanh(total)


class DoubleBAttnDecoderLSTM(nn.Module):
    """Two parallel decoders — one over RGB, one over depth — with
    candidate logits summed (model.py:934-968, agent_double)."""

    embedding_size: int
    hidden_size: int
    dropout_ratio: float
    featdropout: float
    feature_size: int
    angle_feat_size: int
    ctx_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        kw = dict(embedding_size=self.embedding_size,
                  hidden_size=self.hidden_size,
                  dropout_ratio=self.dropout_ratio,
                  featdropout=self.featdropout,
                  feature_size=self.feature_size,
                  angle_feat_size=self.angle_feat_size,
                  ctx_dim=self.ctx_dim, dtype=self.dtype)
        self.rgb_decoder = BAttnDecoderLSTM(**kw)
        self.depth_decoder = BAttnDecoderLSTM(**kw)

    def __call__(self, action, feature, dfeature, cand_feat, cand_dfeat,
                 prev_h1, c_0, prev_h1_d, c_0_d, ctx, ctx_mask=None, *,
                 deterministic: bool = True,
                 already_dropfeat: bool = False):
        h, c, logit, h1, aux = self.rgb_decoder(
            action, feature, cand_feat, prev_h1, c_0, ctx, ctx_mask,
            deterministic=deterministic, already_dropfeat=already_dropfeat)
        hd, cd, logit_d, h1d, _ = self.depth_decoder(
            action, dfeature, cand_dfeat, prev_h1_d, c_0_d, ctx, ctx_mask,
            deterministic=deterministic, already_dropfeat=already_dropfeat)
        return (h, c, h1), (hd, cd, h1d), logit + logit_d, aux
