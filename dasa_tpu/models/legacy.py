"""Legacy encoder zoo — TPU-native rebuilds of the reference's pre-DASA
instruction encoders (r2r_src/r2rmodel.py:82-3162), selectable via
``--encoderType`` alongside the modern paths.

The legacy task layer dispatched these by ``--encoder_type
{lstm, transformer, gpt, bert, vlbert}`` (tasks/R2R/train.py:795-799,
848); ``lstm`` and ``bert`` are already covered by EncoderLSTM and
B/CEncoderLSTM.  This module rebuilds the remaining distinct
capabilities:

- :class:`TransformerTextEncoder` (``Transformer``): word embeddings +
  self-attention stack + top biLSTM (r2rmodel.py:352-456).
- ``Gpt``: the same stack with causal attention (r2rmodel.py:559-634).
  The reference loads pretrained ``openai-gpt`` weights; those are not
  downloadable here, so this is architecture parity with random init.
- :class:`BertImgEncoder` (``BertImg``; legacy flag ``vlbert``):
  single-stream BERT over the joint [vision; text] token sequence
  (r2rmodel.py:999-1124; vilmodel.py:661-806 concatenates projected
  image tokens BEFORE the text and runs the full encoder over both).
- :class:`BertAddEncoder` (``BertAdd``): text-only BERT stack, then
  ``vl_layers`` of joint single-stream attention over [vision; text]
  (r2rmodel.py:1172-1331; vilmodel.py:858-1010 — vision is "added"
  AFTER the text encoder, which makes the text stack cacheable per
  episode exactly like DicModel).

``BertMix`` (r2rmodel.py:1755-1904) is BertAddEncoder with
``strip_vision_ctx=True`` — the fused image rows are dropped so ctx
spans text tokens only.  The remaining zoo members reduce to stacks
above and are dispatched as config aliases (config.py __post_init__):
``Vic`` = DicModel with the full 12-layer text stack and no
vision-only layers (vilmodel.py:1098-1243), ``BertLang``/``HugAdd`` =
BertAdd (joint ctx kept, r2rmodel.py:1906-2061/1331-1461), ``HugLang``
= the text-BERT->LSTM ``BEncoder`` path.  The Multi* three-sentence
variants live in models/encoder.py (MultiDicEncoder).  See
docs/DATA_LIMITS.md for the checkpoint-format duplication argument.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.bert import (
    BertConfig,
    BertEmbeddings,
    BertLayer,
    extended_attention_mask,
)
from dasa_tpu.models.layers import BiLSTM, LSTM

Dtype = Any


class LstmTail(nn.Module):
    """Shared top-LSTM + decoder-init tail (the common suffix of every
    legacy encoder: r2rmodel.py:431-456 and analogs)."""

    hidden_size: int
    dec_hidden_size: int
    dropout_ratio: float
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ctx_in, valid_mask, *, deterministic: bool = True):
        if self.bidirectional:
            ctx, (h_t, c_t) = BiLSTM(self.hidden_size, self.dtype,
                                     name="lstm")(ctx_in, valid_mask)
        else:
            ctx, (h_t, c_t) = LSTM(self.hidden_size, dtype=self.dtype,
                                   name="lstm")(ctx_in, valid_mask)
        num_dir = 2 if self.bidirectional else 1
        decoder_init = jnp.tanh(nn.Dense(
            self.dec_hidden_size, dtype=self.dtype,
            name="encoder2decoder_ht")(h_t))
        if self.hidden_size * num_dir != self.dec_hidden_size:
            c_t = nn.Dense(self.dec_hidden_size, dtype=self.dtype,
                           name="encoder2decoder_ct")(c_t)
        ctx = nn.Dropout(self.dropout_ratio)(ctx,
                                             deterministic=deterministic)
        return ctx, decoder_init, c_t


class TransformerTextEncoder(nn.Module):
    """Self-attention text encoder (+ causal option = the Gpt variant).

    Matches the plain-encoder contract of EncoderLSTM —
    ``(ctx, decoder_init, c_t)`` — so it runs once per episode on the
    plain rollout path."""

    vocab_size: int
    width: int                # transformer hidden (emb_hidden_size)
    heads: int
    n_layers: int
    hidden_size: int          # top-LSTM width per direction
    dec_hidden_size: int
    dropout_ratio: float
    bidirectional: bool = True
    causal: bool = False      # True = GptEncoder (r2rmodel.py:559-634)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_mask, *, deterministic: bool = True):
        cfg = BertConfig(
            vocab_size=self.vocab_size, hidden_size=self.width,
            num_attention_heads=self.heads,
            intermediate_size=4 * self.width,
            hidden_dropout_prob=self.dropout_ratio,
            attention_probs_dropout_prob=self.dropout_ratio)
        x = BertEmbeddings(cfg, self.dtype, name="embeddings")(
            inputs, deterministic=deterministic)
        bias = extended_attention_mask(valid_mask, self.dtype)
        if self.causal:
            length = inputs.shape[1]
            tri = jnp.tril(jnp.ones((length, length), self.dtype))
            bias = bias + (1.0 - tri)[None, None] * -10000.0
        for i in range(self.n_layers):
            x = BertLayer(cfg, self.dtype, name=f"layer_{i}")(
                x, bias, deterministic=deterministic)
        return LstmTail(self.hidden_size, self.dec_hidden_size,
                        self.dropout_ratio, self.bidirectional,
                        self.dtype, name="tail")(
            x, valid_mask, deterministic=deterministic)


class BertImgEncoder(nn.Module):
    """Single-stream joint [vision; text] BERT (the legacy ``vlbert``).

    Cross-modal contract of DicEncoder — ``text_forward`` is the
    per-episode cacheable half, ``__call__`` the per-step half returning
    ``(ctx, decoder_init, c_t, ctx_v=None, visn)``.  The joint stack
    attends text<->vision in EVERY layer (vilmodel.py:797-800), so only
    the embedding lookup is cacheable.  ``ctx`` spans the joint
    (36 + L)-token sequence — the policy extends the context mask
    accordingly (models/policy.py)."""

    bert_config: BertConfig
    hidden_size: int          # top-LSTM width per direction
    dec_hidden_size: int
    dropout_ratio: float
    bidirectional: bool = True
    n_vision_tokens: int = 36
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.bert_config
        self.embeddings = BertEmbeddings(cfg, self.dtype)
        self.img_embedding = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        # joint depth rides the la_layers knob (full-stack in the
        # reference: bert-base num_hidden_layers, vilmodel.py:695)
        self.layers = [BertLayer(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.la_layers)]
        self.tail = LstmTail(self.hidden_size, self.dec_hidden_size,
                             self.dropout_ratio, self.bidirectional,
                             self.dtype)

    def text_forward(self, inputs, valid_mask, *, deterministic=True):
        return self.embeddings(inputs, deterministic=deterministic)

    def __call__(self, text_embeds, valid_mask, seq_len, f_t_all=None, *,
                 deterministic: bool = True):
        batch = text_embeds.shape[0]
        img = self.img_embedding(f_t_all.astype(self.dtype))
        joint = jnp.concatenate([img, text_embeds], axis=1)
        joint_valid = jnp.concatenate(
            [jnp.ones((batch, img.shape[1]), bool), valid_mask], axis=1)
        bias = extended_attention_mask(joint_valid, self.dtype)
        for layer in self.layers:
            joint = layer(joint, bias, deterministic=deterministic)
        visn = joint[:, :self.n_vision_tokens]
        ctx, decoder_init, c_t = self.tail(
            joint, joint_valid, deterministic=deterministic)
        return ctx, decoder_init, c_t, None, visn


class BertAddEncoder(nn.Module):
    """Text-only BERT stack + ``vl_layers`` joint add-layers
    (vilmodel.py:858-1010).  Unlike BertImg, the text stack sees no
    vision, so it caches per episode exactly like DicModel; the small
    joint stack re-runs per step.  Joint-sequence ``ctx`` like
    BertImgEncoder.

    ``strip_vision_ctx=True`` is the **BertMix** variant
    (r2rmodel.py:1755-1904): identical fusion, but the image rows are
    dropped after the joint layers (r2rmodel.py:1776 ``outputs[0][:,
    img_seq_len:]``) so ``ctx`` and the top LSTM span the text tokens
    only — the decoder attends language-only context that has been
    vision-contextualized."""

    bert_config: BertConfig
    hidden_size: int
    dec_hidden_size: int
    dropout_ratio: float
    bidirectional: bool = True
    n_vision_tokens: int = 36
    strip_vision_ctx: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.bert_config
        self.embeddings = BertEmbeddings(cfg, self.dtype)
        self.text_layers = [BertLayer(cfg, self.dtype, name=f"text_{i}")
                            for i in range(cfg.la_layers)]
        self.img_embedding = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.add_layers = [BertLayer(cfg, self.dtype, name=f"add_{i}")
                           for i in range(cfg.vl_layers)]
        self.tail = LstmTail(self.hidden_size, self.dec_hidden_size,
                             self.dropout_ratio, self.bidirectional,
                             self.dtype)

    def text_forward(self, inputs, valid_mask, *, deterministic=True):
        x = self.embeddings(inputs, deterministic=deterministic)
        bias = extended_attention_mask(valid_mask, self.dtype)
        for layer in self.text_layers:
            x = layer(x, bias, deterministic=deterministic)
        if not self.bert_config.update_lang_bert:
            x = jax.lax.stop_gradient(x)
        return x

    def __call__(self, text_embeds, valid_mask, seq_len, f_t_all=None, *,
                 deterministic: bool = True):
        batch = text_embeds.shape[0]
        img = self.img_embedding(f_t_all.astype(self.dtype))
        joint = jnp.concatenate([img, text_embeds], axis=1)
        joint_valid = jnp.concatenate(
            [jnp.ones((batch, img.shape[1]), bool), valid_mask], axis=1)
        bias = extended_attention_mask(joint_valid, self.dtype)
        for layer in self.add_layers:
            joint = layer(joint, bias, deterministic=deterministic)
        visn = joint[:, :self.n_vision_tokens]
        if self.strip_vision_ctx:
            # BertMix: ctx = fused TEXT rows only (r2rmodel.py:1776)
            text_rows = joint[:, img.shape[1]:]
            ctx, decoder_init, c_t = self.tail(
                text_rows, valid_mask, deterministic=deterministic)
        else:
            ctx, decoder_init, c_t = self.tail(
                joint, joint_valid, deterministic=deterministic)
        return ctx, decoder_init, c_t, None, visn
