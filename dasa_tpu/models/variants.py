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


class _VariantDecoderBase(nn.Module):
    """Shared skeleton of the ablation decoders (model.py:578-931): the
    same angle-embed -> panorama attention -> LSTMCell -> instruction
    attention -> candidate logits pipeline as BAttnDecoderLSTM, minus
    shift attention, with hooks where each variant deviates."""

    embedding_size: int
    hidden_size: int
    dropout_ratio: float
    featdropout: float
    feature_size: int
    angle_feat_size: int
    ctx_dim: int
    pred_back: bool = False
    max_input: int = 80
    dtype: Dtype = jnp.float32

    def _common_setup(self):
        self.embedding = nn.Dense(self.embedding_size, dtype=self.dtype)
        self.lstm = LstmCell(self.hidden_size,
                             self.embedding_size + self._lstm_feat_dim(),
                             self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)
        self.feat_att_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)
        self.attention_layer = SoftDotAttention(
            self.hidden_size, self.ctx_dim, self.dtype)
        self.candidate_att_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)
        if self.pred_back:
            self.back_candidate_att_layer = SoftDotAttention(
                self.hidden_size, self.feature_size, self.dtype)

    def _lstm_feat_dim(self) -> int:
        return self.feature_size

    def _drop_env(self, x, deterministic):
        return drop_visual(x, self.angle_feat_size, self.featdropout,
                           self.make_rng("dropout") if not deterministic
                           else None, deterministic)

    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx,
                 ctx_mask=None, *, deterministic: bool = True,
                 already_dropfeat: bool = False, **_
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, Dict[str, jnp.ndarray]]:
        aux: Dict[str, jnp.ndarray] = {}
        drop = lambda x: self.drop(  # noqa: E731
            x, deterministic=deterministic)
        action_embeds = drop(jnp.tanh(
            self.embedding(action.astype(self.dtype))))
        if not already_dropfeat and not deterministic:
            feature = self._drop_env(feature, deterministic)
        prev_h1_drop = drop(prev_h1)
        attn_feat = self._pano_attend(prev_h1_drop, feature)
        concat_input = jnp.concatenate(
            [action_embeds, attn_feat.astype(self.dtype)], axis=-1)
        (h_1, c_1), _ = self.lstm((prev_h1.astype(self.dtype),
                                   c_0.astype(self.dtype)), concat_input)
        h_1_drop = drop(h_1)
        h_tilde = self._instr_attend(h_1, h_1_drop, ctx, ctx_mask, aux,
                                     deterministic)
        h_tilde_drop = drop(h_tilde)
        if not already_dropfeat and not deterministic:
            cand_feat = self._drop_env(cand_feat, deterministic)
        logit, back_feat = self._cand_logit(h_tilde_drop, cand_feat)
        if self.pred_back:
            _, back_logit = self.back_candidate_att_layer(
                prev_h1, back_feat, output_tilde=False,
                output_prob=False)
            aux["back_logit"] = back_logit
        return h_1, c_1, logit, h_tilde, aux

    # hooks -------------------------------------------------------------
    def _pano_attend(self, prev_h1_drop, feature):
        attn_feat, _ = self.feat_att_layer(prev_h1_drop, feature,
                                           output_tilde=False)
        return attn_feat

    def _instr_attend(self, h_1, h_1_drop, ctx, ctx_mask, aux,
                      deterministic):
        h_tilde, _ = self.attention_layer(h_1_drop, ctx, ctx_mask)
        return h_tilde

    def _cand_logit(self, h_tilde_drop, cand_feat):
        """Returns (logit, candidate features for the back head)."""
        _, logit = self.candidate_att_layer(h_tilde_drop, cand_feat,
                                            output_tilde=False,
                                            output_prob=False)
        return logit, cand_feat


class AdvancedDecoderLSTM(_VariantDecoderBase):
    """agent_advanced decoder (model.py:578-656): BAttn skeleton plus an
    unconditional linear progress predictor on the zero-padded
    instruction attention; its MSE is added to the ML loss with a fixed
    weight of 10 (agent_advanced.py:563-565)."""

    def setup(self):
        self._common_setup()
        self.pm_predictor = nn.Dense(1, dtype=self.dtype)

    def _instr_attend(self, h_1, h_1_drop, ctx, ctx_mask, aux,
                      deterministic):
        h_tilde, alpha = self.attention_layer(h_1_drop, ctx, ctx_mask)
        L = alpha.shape[1]
        attw = alpha.astype(self.dtype)
        if L < self.max_input:
            attw = jnp.pad(attw, ((0, 0), (0, self.max_input - L)))
        aux["pred_progress"] = self.pm_predictor(attw)[:, 0]
        return h_tilde


class KVMemAttnDecoderLSTM(_VariantDecoderBase):
    """agent_kvmem decoder (model.py:661-735): a 100-slot learned
    key-value memory refines h_tilde by residual soft attention."""

    kv_slots: int = 100

    def setup(self):
        self._common_setup()
        self.kv = self.param("kv", nn.initializers.normal(1.0),
                             (self.kv_slots, self.hidden_size))
        self.kv_att_layer = SoftDotAttention(
            self.hidden_size, self.hidden_size, self.dtype)

    def _instr_attend(self, h_1, h_1_drop, ctx, ctx_mask, aux,
                      deterministic):
        h_tilde, _ = self.attention_layer(h_1_drop, ctx, ctx_mask)
        mem = jnp.broadcast_to(
            self.kv.astype(self.dtype)[None],
            (h_tilde.shape[0],) + self.kv.shape)
        refined, _ = self.kv_att_layer(h_tilde, mem)
        return h_tilde + refined


class NewAttnDecoderLSTM(_VariantDecoderBase):
    """agent_new decoder (model.py:738-823): panorama/candidate features
    projected to hidden size, scaled-dot attention everywhere, and a
    residual language update h_tilde = h_1 + attn_ctx."""

    lang_dim: int = 2048   # raw ctx width fed to language_to_hidden

    def setup(self):
        self._common_setup()
        self.visionpose_to_hidden = nn.Dense(self.hidden_size,
                                             dtype=self.dtype)
        self.language_to_hidden = nn.Dense(self.hidden_size,
                                           dtype=self.dtype)

    def _lstm_feat_dim(self) -> int:
        return self.hidden_size

    def _pano_attend(self, prev_h1_drop, feature):
        feature = self.visionpose_to_hidden(feature.astype(self.dtype))
        attn_feat, _ = scaled_dot_attention(feature, feature,
                                            prev_h1_drop)
        return attn_feat

    def _instr_attend(self, h_1, h_1_drop, ctx, ctx_mask, aux,
                      deterministic):
        ctx = self.language_to_hidden(ctx.astype(self.dtype))
        attn_ctx, _ = scaled_dot_attention(ctx, ctx, h_1_drop)
        return h_1 + attn_ctx

    def _cand_logit(self, h_tilde_drop, cand_feat):
        # the reference's back head also sees the projected candidates
        # (model.py:817-819)
        cand = self.visionpose_to_hidden(cand_feat.astype(self.dtype))
        _, logit = scaled_dot_attention(cand, cand, h_tilde_drop,
                                        output_prob=False)
        return logit, cand


class MutanAttnDecoderLSTM(_VariantDecoderBase):
    """agent_mutan decoder (model.py:826-931): h_tilde comes from a
    Tucker-decomposed bilinear fusion of the hidden state with the
    attended instruction (fusion.py MutanFusion, R=32, mm=256)."""

    mutan_mm: int = 256
    mutan_rank: int = 32

    def setup(self):
        self._common_setup()
        self.mutan = MutanFusion(
            dim_hv=self.hidden_size, dim_hq=self.ctx_dim,
            dim_mm=self.mutan_mm, rank=self.mutan_rank,
            dropout_v=0.2, dropout_q=0.2, dtype=self.dtype)
        self.linear_mutan = nn.Dense(self.hidden_size, dtype=self.dtype)

    def _instr_attend(self, h_1, h_1_drop, ctx, ctx_mask, aux,
                      deterministic):
        attended, _ = self.attention_layer(h_1_drop, ctx, ctx_mask,
                                           output_tilde=False)
        fused = self.mutan(h_1_drop, attended,
                           deterministic=deterministic)
        return self.linear_mutan(fused)


class McattDecoder(_VariantDecoderBase):
    """agent_mcatt decoder (model.py:1505-1591): the plain skeleton with
    instruction attention at hidden width (the McattEncoder's
    co-attended token stream)."""

    def setup(self):
        self._common_setup()


class MTDecoder(nn.Module):
    """The MT decoder (model.py:1609-1707): gated hidden update from the
    mean panorama token, then an MLP scores every view token (plus a
    learned STOP token) against the attended instruction and the heading
    embedding; candidate logits are gathered by view index.  NOTE: the
    reference's agent_mt import is broken (train.py:38 imports a
    misspelled class), so this decoder is unreachable upstream; here it
    is a working --agent_type mt.  Dimension note: the reference mixes
    d_enc_hidden_size and d_hidden_size, which only coincide in the
    published config; we use hidden_size uniformly."""

    embedding_size: int
    hidden_size: int
    dropout_ratio: float
    featdropout: float
    feature_size: int      # visual + angle width
    angle_feat_size: int
    ctx_dim: int           # instruction ctx width
    vemb_dim: int = 768    # vision-BERT token width
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Dense(self.embedding_size, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)
        self.v_stop_feat = self.param("v_stop_feat",
                                      nn.initializers.normal(1.0),
                                      (self.feature_size,))
        self.vemb_to_v = nn.Dense(self.feature_size, dtype=self.dtype)
        self.hv_to_upd = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.h_to_ctx = nn.Dense(self.ctx_dim, dtype=self.dtype)
        # the reference's MLP(use_relu=False, dropout_r=0) is two stacked
        # linears (model.py:1631)
        self.mlp_hidden = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.mlp_out = nn.Dense(1, dtype=self.dtype)

    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx,
                 ctx_mask=None, *, deterministic: bool = True,
                 already_dropfeat: bool = False, v_emb=None,
                 cand_idx=None, **_):
        aux: Dict[str, jnp.ndarray] = {}
        action_embeds = self.drop(
            jnp.tanh(self.embedding(action.astype(self.dtype))),
            deterministic=deterministic)
        if not already_dropfeat and not deterministic:
            feature = drop_visual(feature, self.angle_feat_size,
                                  self.featdropout,
                                  self.make_rng("dropout"), deterministic)
        feature = self.vemb_to_v(v_emb.astype(self.dtype)) + feature
        mean_v = jnp.mean(feature[..., :-self.angle_feat_size], axis=1)
        update_v = self.hv_to_upd(
            jnp.concatenate([prev_h1.astype(self.dtype), mean_v], axis=-1))
        gate = jax.nn.sigmoid(update_v)
        h = prev_h1.astype(self.dtype) * (1 - gate) + gate * update_v
        instr, _ = scaled_dot_attention(
            ctx.astype(self.dtype), ctx.astype(self.dtype),
            self.h_to_ctx(h)[:, None, :],
            mask=None if ctx_mask is None else ctx_mask[:, None, :])
        instr = instr[:, 0]
        b, n_views, fdim = feature.shape
        stop_tok = jnp.broadcast_to(
            self.v_stop_feat.astype(self.dtype)[None, None, :],
            (b, 1, fdim))
        tokens = jnp.concatenate([feature, stop_tok], axis=1)
        instr_angle = jnp.concatenate([instr, action_embeds], axis=-1)
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(instr_angle[:, None, :],
                                      (b, n_views + 1,
                                       instr_angle.shape[-1]))], axis=-1)
        score = self.mlp_out(self.mlp_hidden(tokens))[..., 0]
        logit = jnp.take_along_axis(score, cand_idx, axis=-1)
        return h, h, logit, h, aux


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
