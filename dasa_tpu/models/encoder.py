"""Instruction encoders.

- :class:`EncoderLSTM` — the plain-path encoder (reference:
  r2r_src/model.py:16-86).
- :class:`DicEncoder` — the DASA path: DicModel cross-modal BERT, optional
  masked input reversal, top bidirectional LSTM, projections to decoder
  dims (reference: r2r_src/r2rmodel.py:2199-2365).

The masked LSTM removes the reference's length-sort/permute requirement
(agent_dg.py:262-284): batches stay in env order.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.bert import BertConfig, DicModel
from dasa_tpu.models.layers import BiLSTM

Dtype = Any


class EncoderLSTM(nn.Module):
    """Embedding -> bidir LSTM -> (ctx, decoder_init, c_t)."""

    vocab_size: int
    embedding_size: int
    hidden_size: int          # per-direction when bidirectional
    dropout_ratio: float
    bidirectional: bool = True
    sub_out: str = "tanh"     # tanh | max (model.py:76-82)
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_mask, *, deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.embedding_size, dtype=self.dtype,
                     name="embedding")(inputs)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        if self.bidirectional:
            ctx, (h_t, c_t) = BiLSTM(self.hidden_size, self.dtype,
                                     name="lstm")(x, valid_mask)
        else:
            from dasa_tpu.models.layers import LSTM
            ctx, (h_t, c_t) = LSTM(self.hidden_size, dtype=self.dtype,
                                   name="lstm")(x, valid_mask)
        out_dim = h_t.shape[-1]
        e2d = nn.Dense(out_dim, dtype=self.dtype, name="encoder2decoder")
        if self.sub_out == "max":
            ctx_max = jnp.where(valid_mask[..., None], ctx, -jnp.inf).max(1)
            decoder_init = jnp.tanh(e2d(ctx_max))
        else:
            decoder_init = jnp.tanh(e2d(h_t))
        ctx = nn.Dropout(self.dropout_ratio)(ctx, deterministic=deterministic)
        if self.zero_init:
            return ctx, jnp.zeros_like(decoder_init), jnp.zeros_like(c_t)
        return ctx, decoder_init, c_t


class BertTextEncoderLSTM(nn.Module):
    """B/CEncoderLSTM (reference model.py:88-247): text-only BERT
    embeddings (optionally frozen via stop_gradient, matching .detach())
    feed a biLSTM; the C variant first projects the BERT width down to
    the word-embedding size (model.py:186, 221).  Same output contract
    as EncoderLSTM — (ctx, decoder_init, c_t) — so it slots into the
    plain rollout path and is fully cacheable per episode (no vision
    input)."""

    bert_config: BertConfig
    hidden_size: int          # per-direction LSTM width
    dropout_ratio: float
    project_dim: Optional[int] = None   # C variant: BERT -> project_dim
    bidirectional: bool = True
    sub_out: str = "tanh"
    zero_init: bool = False
    n_layer_concat: int = 1   # bert_n_layers: concat last-n layer
                              # outputs before the LSTM (r2rmodel.py:772)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, valid_mask, *, deterministic: bool = True):
        bert = DicModel(self.bert_config, self.dtype, name="bert")
        x = bert.text_forward(inputs, valid_mask.astype(jnp.int32),
                              deterministic=deterministic,
                              collect_last_n=self.n_layer_concat)
        if self.project_dim is not None:
            x = nn.Dense(self.project_dim, dtype=self.dtype,
                         name="linear_in")(x)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        if self.bidirectional:
            ctx, (h_t, c_t) = BiLSTM(self.hidden_size, self.dtype,
                                     name="lstm")(x, valid_mask)
        else:
            from dasa_tpu.models.layers import LSTM
            ctx, (h_t, c_t) = LSTM(self.hidden_size, dtype=self.dtype,
                                   name="lstm")(x, valid_mask)
        out_dim = h_t.shape[-1]
        e2d = nn.Dense(out_dim, dtype=self.dtype, name="encoder2decoder")
        if self.sub_out == "max":
            ctx_max = jnp.where(valid_mask[..., None], ctx, -jnp.inf).max(1)
            decoder_init = jnp.tanh(e2d(ctx_max))
        else:
            decoder_init = jnp.tanh(e2d(h_t))
        ctx = nn.Dropout(self.dropout_ratio)(ctx,
                                             deterministic=deterministic)
        if self.zero_init:
            return ctx, jnp.zeros_like(decoder_init), jnp.zeros_like(c_t)
        return ctx, decoder_init, c_t


class MultiDicEncoder(nn.Module):
    """Shared-weights 3-instruction DicEncoder (reference
    r2rmodel.py:2709-2820, multi_share=True — the only mode the
    reference implements).

    The reference loops a python list of n_sentences inputs through the
    SAME bert+lstm; here the sentence axis folds into the batch for one
    (B*S, L) pass.  Returns per-sentence contexts plus the averaged
    decoder init states (r2rmodel.py:2812-2817 divides by n_sentences).
    Consumers merge per-sentence attention with
    :func:`merge_sentence_attention` (tasks/R2R/model.py:3571-3579)."""

    bert_config: "BertConfig"
    hidden_size: int
    dec_hidden_size: int
    dropout_ratio: float
    bidirectional: bool = True
    reverse_input: bool = True
    top_lstm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.inner = DicEncoder(
            self.bert_config, self.hidden_size, self.dec_hidden_size,
            self.dropout_ratio, bidirectional=self.bidirectional,
            reverse_input=self.reverse_input, top_lstm=self.top_lstm,
            dtype=self.dtype)

    def text_forward(self, instr, valid_mask, *, deterministic=True):
        """instr (B, S, L) -> folded text embeds (B*S, L, H_bert)."""
        b, s, length = instr.shape
        return self.inner.text_forward(
            instr.reshape(b * s, length),
            valid_mask.reshape(b * s, length),
            deterministic=deterministic)

    def __call__(self, text_embeds, valid_mask, seq_len, f_t_all=None, *,
                 deterministic: bool = True):
        """text_embeds: folded (B*S, L, H) from text_forward; valid_mask
        (B, S, L); seq_len (B, S).  Returns (ctxs (B, S, L, C),
        decoder_init, c_t, masks (B, S, L)) with init states averaged
        over sentences."""
        b, s, length = valid_mask.shape
        f_rep = (None if f_t_all is None else
                 jnp.repeat(f_t_all, s, axis=0))
        ctx, h0, c0, _ctx_v, _visn = self.inner(
            text_embeds, valid_mask.reshape(b * s, length),
            seq_len.reshape(b * s), f_t_all=f_rep,
            deterministic=deterministic)
        ctxs = ctx.reshape(b, s, length, ctx.shape[-1])
        decoder_init = h0.reshape(b, s, -1).mean(axis=1)
        c_t = c0.reshape(b, s, -1).mean(axis=1)
        return ctxs, decoder_init, c_t, valid_mask


def merge_sentence_attention(attention_fn, h, ctxs, valid_masks,
                             merge: str = "mean"):
    """Per-sentence instruction attention + merge (the legacy decoders'
    att_ctx_merge, tasks/R2R/model.py:3489-3498, 3571-3579): run the
    given attention layer against each sentence's context and combine
    the h_tildes by mean/sum/max, or concatenate ('cat').

    attention_fn(h, ctx, mask) -> (h_tilde, attn); ctxs (B, S, L, C);
    valid_masks (B, S, L) True = valid token."""
    tildes = []
    attns = []
    s = ctxs.shape[1]
    for si in range(s):
        h_tilde, attn = attention_fn(h, ctxs[:, si], ~valid_masks[:, si])
        tildes.append(h_tilde)
        attns.append(attn)
    stack = jnp.stack(tildes, axis=1)  # (B, S, D)
    if merge == "mean":
        merged = stack.mean(axis=1)
    elif merge == "sum":
        merged = stack.sum(axis=1)
    elif merge == "max":
        merged = stack.max(axis=1)
    elif merge == "cat":
        merged = stack.reshape(stack.shape[0], -1)
    else:
        raise ValueError(merge)
    return merged, attns


def reverse_valid_tokens(embeds, valid_mask, seq_len):
    """Reverse each row's first seq_len tokens in place, zeroing pads —
    the reference's masked scatter reversal (r2rmodel.py:2326-2330)."""
    length = embeds.shape[1]
    j = jnp.arange(length)[None, :]
    src = jnp.clip(seq_len[:, None] - 1 - j, 0, length - 1)
    rev = jnp.take_along_axis(embeds, src[:, :, None], axis=1)
    return jnp.where(valid_mask[:, :, None], rev, 0.0)


class DicEncoder(nn.Module):
    """DicModel + top LSTM instruction encoder for the DG agent."""

    bert_config: BertConfig
    hidden_size: int           # d_enc_hidden_size (per direction)
    dec_hidden_size: int       # d_hidden_size
    dropout_ratio: float       # d_dropout_ratio
    bidirectional: bool = True
    reverse_input: bool = True
    top_lstm: bool = True
    ctx_v: bool = False
    ctx_v_dim: int = 2176
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = DicModel(self.bert_config, self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)
        if self.top_lstm:
            if self.bidirectional:
                self.lstm = BiLSTM(self.hidden_size, self.dtype)
            else:
                from dasa_tpu.models.layers import LSTM
                self.lstm = LSTM(self.hidden_size, dtype=self.dtype)
        num_dir = 2 if self.bidirectional else 1
        self.encoder2decoder_ht = nn.Dense(self.dec_hidden_size, dtype=self.dtype)
        self.encoder2decoder_ct = nn.Dense(self.dec_hidden_size, dtype=self.dtype)
        self.encoder_lstm2decoder_ht = nn.Dense(self.dec_hidden_size,
                                                dtype=self.dtype)
        self.encoder_lstm2decoder_ct = nn.Dense(self.dec_hidden_size,
                                                dtype=self.dtype)
        if self.ctx_v:
            self.ctx_v_to_v = nn.Dense(self.ctx_v_dim, dtype=self.dtype)
        self._num_dir = num_dir

    def text_forward(self, inputs, valid_mask, *, deterministic=True):
        """Cacheable text-only stack (exact to re-running per step when
        update_lang_bert is False)."""
        return self.bert.text_forward(
            inputs, valid_mask.astype(jnp.int32),
            deterministic=deterministic)

    def __call__(self, text_embeds, valid_mask, seq_len, f_t_all=None, *,
                 deterministic: bool = True, lstm_pallas: bool = False):
        """text_embeds: output of text_forward (B, L, H_bert).
        Returns (ctx, decoder_init, c_t, ctx_v, visn) — visn is the raw
        vision-token stream (B, 36, H_bert) consumed by the MT decoder.
        lstm_pallas routes the top LSTM through the VMEM-resident token
        scan (ops/lstm.py) — set by the fused device programs only."""
        embeds, pooled, visn = self.bert.cross_forward(
            text_embeds, valid_mask.astype(jnp.int32), f_t_all,
            deterministic=deterministic)

        if self.reverse_input:
            embeds = reverse_valid_tokens(embeds, valid_mask, seq_len)

        if not self.top_lstm:
            ctx = embeds
            c_t = self.encoder2decoder_ct(embeds[:, -1])
            decoder_init = jnp.tanh(self.encoder2decoder_ht(pooled))
        else:
            ctx, (h_t, c_t) = self.lstm(embeds, valid_mask,
                                        pallas=lstm_pallas)
            decoder_init = jnp.tanh(self.encoder_lstm2decoder_ht(h_t))
            if self.hidden_size * self._num_dir != self.dec_hidden_size:
                c_t = self.encoder_lstm2decoder_ct(c_t)

        ctx = self.drop(ctx, deterministic=deterministic)
        ctx_v = None
        if self.ctx_v and visn is not None:
            ctx_v = self.ctx_v_to_v(visn)
        return ctx, decoder_init, c_t, ctx_v, visn
