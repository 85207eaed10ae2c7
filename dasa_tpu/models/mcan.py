"""MCAN co-attention blocks (the agent_mcatt ablation encoder).

Reference: r2r_src/model.py:1083-1462 — the standard Modular
Co-Attention Network (MHAtt + FFN, SA self-attention blocks, SGA guided
attention, stacked encoder-decoder, AttFlat pooling) plus the
McattEncoder that co-attends instruction tokens with the 36-view
panorama (config consts at param.py:233-244).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.layers import BiLSTM, NEG_INF

Dtype = Any


class MHAtt(nn.Module):
    hidden_size: int
    n_head: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, v, k, q, mask=None, *, deterministic=True):
        """mask: (B, 1, 1, Lk) True = masked."""
        b = q.shape[0]
        hd = self.hidden_size // self.n_head

        def proj(x, name):
            y = nn.Dense(self.hidden_size, dtype=self.dtype, name=name)(x)
            return y.reshape(b, -1, self.n_head, hd).transpose(0, 2, 1, 3)

        vq = proj(q, "linear_q")
        vk = proj(k, "linear_k")
        vv = proj(v, "linear_v")
        scores = jnp.einsum("bhqd,bhkd->bhqk", vq, vk) / math.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask, NEG_INF, scores)
        att = jax.nn.softmax(scores, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vv)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="linear_merge")(out)


class FFN(nn.Module):
    hidden_size: int
    ff_size: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        y = nn.Dense(self.ff_size, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.Dense(self.hidden_size, dtype=self.dtype)(y)


class SA(nn.Module):
    """Self-attention block with residual LayerNorms."""

    hidden_size: int
    n_head: int
    ff_size: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic=True):
        att = MHAtt(self.hidden_size, self.n_head, self.dropout,
                    self.dtype, name="mhatt")(
            x, x, x, mask, deterministic=deterministic)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + att)
        ff = FFN(self.hidden_size, self.ff_size, self.dropout, self.dtype,
                 name="ffn")(x, deterministic=deterministic)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + ff)


class SGA(nn.Module):
    """Self-attention + guided cross-attention block."""

    hidden_size: int
    n_head: int
    ff_size: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None, *,
                 deterministic=True):
        att = MHAtt(self.hidden_size, self.n_head, self.dropout,
                    self.dtype, name="mhatt1")(
            x, x, x, x_mask, deterministic=deterministic)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + att)
        att = MHAtt(self.hidden_size, self.n_head, self.dropout,
                    self.dtype, name="mhatt2")(
            y, y, x, y_mask, deterministic=deterministic)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + att)
        ff = FFN(self.hidden_size, self.ff_size, self.dropout, self.dtype,
                 name="ffn")(x, deterministic=deterministic)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x + ff)


class MCASGASGA(nn.Module):
    """Co-attention backbone: per layer, SA on each stream then SGA in
    both directions (model.py MCA_SGA_SGA)."""

    hidden_size: int
    n_head: int
    ff_size: int
    n_layers: int
    dropout: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, x_mask=None, y_mask=None, *,
                 deterministic=True):
        for i in range(self.n_layers):
            x = SA(self.hidden_size, self.n_head, self.ff_size,
                   self.dropout, self.dtype, name=f"sa_x_{i}")(
                x, x_mask, deterministic=deterministic)
            y = SA(self.hidden_size, self.n_head, self.ff_size,
                   self.dropout, self.dtype, name=f"sa_y_{i}")(
                y, y_mask, deterministic=deterministic)
            x2 = SGA(self.hidden_size, self.n_head, self.ff_size,
                     self.dropout, self.dtype, name=f"sga_x_{i}")(
                x, y, x_mask, y_mask, deterministic=deterministic)
            y = SGA(self.hidden_size, self.n_head, self.ff_size,
                    self.dropout, self.dtype, name=f"sga_y_{i}")(
                y, x, y_mask, x_mask, deterministic=deterministic)
            x = x2
        return x, y


class AttFlat(nn.Module):
    """Attention-weighted flattening to a single vector."""

    hidden_size: int
    flat_mlp_size: int
    flat_out_size: int
    glimpses: int = 1
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic=True):
        att = nn.Dense(self.flat_mlp_size, dtype=self.dtype)(x)
        att = nn.relu(att)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        att = nn.Dense(self.glimpses, dtype=self.dtype)(att)  # (B, L, G)
        if mask is not None:
            att = jnp.where(mask[:, 0, 0, :, None], NEG_INF, att)
        att = jax.nn.softmax(att, axis=1)
        pooled = jnp.einsum("blg,bld->bgd", att, x).reshape(
            x.shape[0], -1)
        return nn.Dense(self.flat_out_size, dtype=self.dtype)(pooled)


class McattEncoder(nn.Module):
    """Instruction x panorama co-attention encoder (model.py:1340-1462):
    embed + biLSTM the tokens, project the 36-view features, run the
    SGA-SGA backbone, AttFlat the text, and attend the vision stream
    with the flattened text query.

    Split into `text_forward` (embed + biLSTM, vision-independent and
    cacheable per episode) and `cross_forward` (co-attention backbone,
    re-run per step since the panorama changes), mirroring the DicModel
    split."""

    vocab_size: int
    word_embed_size: int
    hidden_size: int
    n_head: int
    ff_size: int
    n_layers: int
    img_feat_size: int
    flat_mlp_size: int = 512
    flat_out_size: int = 768
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.word_embed_size,
                                  dtype=self.dtype)
        self.lstm = BiLSTM(self.hidden_size // 2, self.dtype)
        self.img_feat_linear = nn.Dense(self.hidden_size, dtype=self.dtype)
        self.backbone = MCASGASGA(self.hidden_size, self.n_head,
                                  self.ff_size, self.n_layers,
                                  self.dropout, self.dtype)
        self.attflat_lang = AttFlat(self.hidden_size, self.flat_mlp_size,
                                    self.flat_out_size,
                                    dropout=self.dropout, dtype=self.dtype)

    def text_forward(self, seq, pad_mask, *, deterministic=True):
        """Vision-independent token stream (B, L, H)."""
        x = self.embedding(seq)
        x, _ = self.lstm(x, ~pad_mask)
        return x

    def cross_forward(self, x, pad_mask, f_t_all, *, deterministic=True):
        """Co-attention over (token stream, panorama).  Returns
        (seq_feat, attended_txt, v_feat, attended_v)."""
        b, v_num = f_t_all.shape[0], f_t_all.shape[1]
        seq_mask = pad_mask[:, None, None, :]
        v_mask = jnp.zeros((b, 1, 1, v_num), bool)
        v = self.img_feat_linear(f_t_all.astype(self.dtype))
        x, v = self.backbone(x, v, seq_mask, v_mask,
                             deterministic=deterministic)
        attended_txt = self.attflat_lang(x, seq_mask,
                                         deterministic=deterministic)
        # single-head dot attention of the flat text query over vision
        d_k = attended_txt.shape[-1]
        scores = jnp.einsum("bd,bvd->bv", attended_txt, v) / math.sqrt(d_k)
        att = jax.nn.softmax(scores, axis=-1)
        attended_v = jnp.einsum("bv,bvd->bd", att, v)
        return x, attended_txt, v, attended_v

    def __call__(self, seq, pad_mask, f_t_all, *, deterministic=True):
        """seq (B, L) ids; pad_mask (B, L) True at PAD; f_t_all
        (B, 36, F).  Returns (seq_feat, attended_txt, v_feat,
        attended_v)."""
        x = self.text_forward(seq, pad_mask, deterministic=deterministic)
        return self.cross_forward(x, pad_mask, f_t_all,
                                  deterministic=deterministic)
