"""Cross-modal BERT (DicModel) in Flax.

Re-implements the reference's vendored pytorch-transformers BERT stack and
its LXMERT-style cross-modal extension (r2r_src/vilmodel.py):

- BERT primitives: embeddings / self-attention / layer / pooler
  (vilmodel.py:147-441)
- BertXAttention cross-attention (vilmodel.py:443-509)
- LXRTXLayer: one *shared* cross-attention applied in both directions,
  then per-stream self-attention and FFN (vilmodel.py:1014-1064)
- VisionEncoder: linear+LN+dropout on (36, 2176) panorama features
  (vilmodel.py:1067-1095)
- DicModel: la_layers text-only BertLayers -> optional freeze ->
  VisionEncoder -> optional v_layers vision-only -> vl_layers LXRTXLayer
  -> pooled CLS (vilmodel.py:1245-1423)

TPU-native differences: fused QKV projections feed the MXU as one matmul;
text layers can run once per episode and be cached (the reference re-runs
them every step although only the vision input changes — agent_dg.py:
789-797); freezing uses stop_gradient, matching .detach().
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12
    # DASA-injected fields (r2rmodel.py:2218-2235)
    img_feature_dim: int = 2176
    la_layers: int = 9
    vl_layers: int = 3
    v_layers: int = 0
    update_lang_bert: bool = False
    update_add_layer: bool = False
    action_space: int = 36

    @staticmethod
    def base(**kw) -> "BertConfig":
        return BertConfig(**kw)

    @staticmethod
    def large(**kw) -> "BertConfig":
        kw.setdefault("hidden_size", 1024)
        kw.setdefault("num_attention_heads", 16)
        kw.setdefault("intermediate_size", 4096)
        return BertConfig(**kw)


def extended_attention_mask(mask: jnp.ndarray, dtype) -> jnp.ndarray:
    """(B, L) 1/0 valid mask -> additive (B, 1, 1, L) bias of 0 / -10000
    (vilmodel.py:1345-1355)."""
    m = mask.astype(dtype)[:, None, None, :]
    return (1.0 - m) * -10000.0


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        dtype=self.dtype)
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype)
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype)
        self.LayerNorm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                      dtype=self.dtype)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids=None, *,
                 deterministic: bool = True):
        seq_len = input_ids.shape[1]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        pos_ids = jnp.arange(seq_len)[None, :]
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(pos_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.LayerNorm(x)
        return self.dropout(x, deterministic=deterministic)

    def attend(self, x):
        """Project hidden states onto the (tied) word-embedding matrix —
        the reference's tie_weights MLM decoder
        (r2rpretrain_class.py:124-125)."""
        return self.word_embeddings.attend(x)


class BertAttentionCore(nn.Module):
    """Multi-head attention over (query_input, kv_input) with additive
    mask, fused QKV when self-attending.  Covers BertSelfAttention
    (vilmodel.py:200-250) and BertOutAttention (443-509)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query_input, kv_input, att_bias, *,
                 deterministic: bool = True):
        cfg = self.config
        n_head = cfg.num_attention_heads
        head_dim = cfg.hidden_size // n_head

        def proj(x, name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(
                x.astype(self.dtype))

        q = proj(query_input, "query")
        k = proj(kv_input, "key")
        v = proj(kv_input, "value")

        def split_heads(x):
            b, l, _ = x.shape
            return x.reshape(b, l, n_head, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
        if att_bias is not None:
            scores = scores + att_bias
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob)(
            probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, l, d = ctx.shape
        return ctx.transpose(0, 2, 1, 3).reshape(b, l, h * d)


class BertSelfOutput(nn.Module):
    """Dense + dropout + residual LayerNorm (vilmodel.py:253-266)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, *, deterministic: bool = True):
        cfg = self.config
        hidden = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="dense")(
            hidden)
        hidden = nn.Dropout(cfg.hidden_dropout_prob)(
            hidden, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(hidden + residual.astype(self.dtype))


class BertAttention(nn.Module):
    """Self-attention block (vilmodel.py:269-300)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_bias, *, deterministic: bool = True):
        attn = BertAttentionCore(self.config, self.dtype, name="self")(
            x, x, att_bias, deterministic=deterministic)
        return BertSelfOutput(self.config, self.dtype, name="output")(
            attn, x, deterministic=deterministic)


class BertXAttention(nn.Module):
    """Cross-attention block (vilmodel.py:443-453)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, ctx_att_bias, *, deterministic: bool = True):
        attn = BertAttentionCore(self.config, self.dtype, name="att")(
            x, ctx, ctx_att_bias, deterministic=deterministic)
        return BertSelfOutput(self.config, self.dtype, name="output")(
            attn, x, deterministic=deterministic)


class BertIntermediate(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="dense")(x)
        return nn.gelu(x, approximate=False)


class BertOutput(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, *, deterministic: bool = True):
        cfg = self.config
        hidden = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="dense")(
            hidden)
        hidden = nn.Dropout(cfg.hidden_dropout_prob)(
            hidden, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="LayerNorm")(hidden + residual)


class BertLayer(nn.Module):
    """Transformer encoder layer (vilmodel.py:335-353)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_bias, *, deterministic: bool = True):
        attn_out = BertAttention(self.config, self.dtype, name="attention")(
            x, att_bias, deterministic=deterministic)
        inter = BertIntermediate(self.config, self.dtype,
                                 name="intermediate")(attn_out)
        return BertOutput(self.config, self.dtype, name="output")(
            inter, attn_out, deterministic=deterministic)


class BertPooler(nn.Module):
    """tanh Dense on the CLS token (vilmodel.py:426-441)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, seq):
        cls = seq[:, 0]
        return jnp.tanh(
            nn.Dense(self.config.hidden_size, dtype=self.dtype,
                     name="dense")(cls))


class LXRTXLayer(nn.Module):
    """Cross-modal layer: one shared cross-attention applied in both
    directions, then per-stream self-attention and FFN
    (vilmodel.py:1014-1064)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, lang, lang_bias, visn, visn_bias, *,
                 deterministic: bool = True):
        xatt = BertXAttention(self.config, self.dtype, name="visual_attention")
        lang_x = xatt(lang, visn, visn_bias, deterministic=deterministic)
        visn_x = xatt(visn, lang, lang_bias, deterministic=deterministic)

        lang_s = BertAttention(self.config, self.dtype, name="lang_self_att")(
            lang_x, lang_bias, deterministic=deterministic)
        visn_s = BertAttention(self.config, self.dtype, name="visn_self_att")(
            visn_x, visn_bias, deterministic=deterministic)

        lang_i = BertIntermediate(self.config, self.dtype,
                                  name="lang_inter")(lang_s)
        visn_i = BertIntermediate(self.config, self.dtype,
                                  name="visn_inter")(visn_s)
        lang_o = BertOutput(self.config, self.dtype, name="lang_output")(
            lang_i, lang_s, deterministic=deterministic)
        visn_o = BertOutput(self.config, self.dtype, name="visn_output")(
            visn_i, visn_s, deterministic=deterministic)
        return lang_o, visn_o


class VisionEncoder(nn.Module):
    """Linear + LN + dropout on panorama features (vilmodel.py:1067-1095)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, deterministic: bool = True):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="visn_fc")(
            feats.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                         name="visn_layer_norm")(x)
        return nn.Dropout(cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)


class DicModel(nn.Module):
    """The DASA cross-modal encoder (vilmodel.py:1245-1423).

    Split into `text_forward` and `cross_forward` so the text-only stack
    (la_layers x BertLayer) can run once per episode and be cached across
    rollout steps — exact when update_lang_bert is False, since only the
    vision input changes per step."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embeddings = BertEmbeddings(cfg, self.dtype)
        self.lalayer = [BertLayer(cfg, self.dtype, name=f"lalayer_{i}")
                        for i in range(cfg.la_layers)]
        self.addlayer = [LXRTXLayer(cfg, self.dtype, name=f"addlayer_{i}")
                         for i in range(cfg.vl_layers)]
        self.vlayer = [BertLayer(cfg, self.dtype, name=f"vlayer_{i}")
                       for i in range(cfg.v_layers)]
        self.vision_encoder = VisionEncoder(cfg, self.dtype)
        self.pooler = BertPooler(cfg, self.dtype)

    def text_forward(self, input_ids, att_mask, *, deterministic=True,
                     collect_last_n: int = 1):
        """Embeddings + la_layers text-only self-attention.  att_mask is
        (B, L) with 1 = attend.

        collect_last_n > 1 returns the channel-concat of the last n
        layer outputs (the legacy zoo's ``bert_n_layers`` feature-mixing
        knob, r2rmodel.py:772-773 ``torch.cat(all_encoder_layers[-n:],
        -1)``) — no extra parameters, so checkpoint import is
        unaffected."""
        bias = extended_attention_mask(att_mask, self.dtype)
        x = self.embeddings(input_ids, deterministic=deterministic)
        collected = []
        for layer in self.lalayer:
            x = layer(x, bias, deterministic=deterministic)
            collected.append(x)
        if collect_last_n > 1:
            if collect_last_n > len(collected):
                raise ValueError(
                    f"collect_last_n={collect_last_n} exceeds "
                    f"la_layers={len(collected)}")
            x = jnp.concatenate(collected[-collect_last_n:], axis=-1)
        if not self.config.update_lang_bert:
            x = jax.lax.stop_gradient(x)
        return x

    def cross_forward(self, text_embeds, att_mask, img_feats, *,
                      deterministic=True):
        """Vision encoding + vl_layers cross-modal attention + pooling."""
        cfg = self.config
        lang_bias = extended_attention_mask(att_mask, self.dtype)
        lang = text_embeds.astype(self.dtype)
        if img_feats is not None:
            visn = self.vision_encoder(img_feats, deterministic=deterministic)
            visn_bias = None  # all 36 views are valid
            for layer in self.vlayer:
                visn = layer(visn, visn_bias, deterministic=deterministic)
            for layer in self.addlayer:
                lang, visn = layer(lang, lang_bias, visn, visn_bias,
                                   deterministic=deterministic)
            if not cfg.update_add_layer:
                lang = jax.lax.stop_gradient(lang)
                visn = jax.lax.stop_gradient(visn)
        else:
            visn = None
        pooled = self.pooler(lang)
        return lang, pooled, visn

    def __call__(self, input_ids, att_mask=None, img_feats=None, *,
                 deterministic: bool = True):
        if att_mask is None:
            att_mask = jnp.ones_like(input_ids)
        text = self.text_forward(input_ids, att_mask,
                                 deterministic=deterministic)
        return self.cross_forward(text, att_mask, img_feats,
                                  deterministic=deterministic)
