"""Speaker networks (trajectory -> instruction).

Reference: r2r_src/model.py:984-1078.  The encoder consumes the action
feature sequence (the candidate feature of each teacher move) with
per-step attention over the panorama sequence; the decoder is a word
LSTM with attention over the encoder context.  Matching the reference,
the encoder LSTMs run unpacked over the padded sequence (padding carries
repeated final-state features / zero action features) and masking happens
only in the decoder's ctx attention.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.decoder import drop_visual
from dasa_tpu.models.layers import BiLSTM, LSTM, LstmCell, SoftDotAttention

Dtype = Any


class SpeakerEncoder(nn.Module):
    feature_size: int      # visual + angle
    hidden_size: int       # rnn_dim
    dropout_ratio: float
    featdropout: float
    angle_feat_size: int
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        per_dir = self.hidden_size // (2 if self.bidirectional else 1)
        mk = BiLSTM if self.bidirectional else LSTM
        self.lstm = mk(per_dir, self.dtype)
        self.post_lstm = mk(per_dir, self.dtype)
        self.attention_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)

    def __call__(self, action_embeds, feature, *,
                 already_dropfeat: bool = False,
                 deterministic: bool = True):
        """action_embeds (B, T, F); feature (B, T, 36, F)."""
        x = action_embeds
        if not already_dropfeat and not deterministic:
            x = drop_visual(x, self.angle_feat_size, self.featdropout,
                            self.make_rng("dropout"), deterministic)
        b, t, _ = x.shape
        all_valid = jnp.ones((b, t), bool)
        ctx, _ = self.lstm(x, all_valid)
        ctx = self.drop(ctx, deterministic=deterministic)

        if not already_dropfeat and not deterministic:
            feature = drop_visual(feature, self.angle_feat_size,
                                  self.featdropout,
                                  self.make_rng("dropout"), deterministic)
        flat_ctx = ctx.reshape(b * t, self.hidden_size)
        flat_feat = feature.reshape(b * t, feature.shape[2], -1)
        x, _ = self.attention_layer(flat_ctx, flat_feat)
        x = x.reshape(b, t, self.hidden_size)
        x = self.drop(x, deterministic=deterministic)
        x, _ = self.post_lstm(x, all_valid)
        return self.drop(x, deterministic=deterministic)


class SpeakerDecoder(nn.Module):
    vocab_size: int
    embedding_size: int    # wemb
    hidden_size: int       # rnn_dim
    dropout_ratio: float
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.embedding_size,
                                  dtype=self.dtype)
        self.lstm = LstmCell(self.hidden_size, self.embedding_size,
                             self.dtype)
        self.attention_layer = SoftDotAttention(
            self.hidden_size, self.hidden_size, self.dtype)
        self.projection = nn.Dense(self.vocab_size, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)

    def step(self, word, ctx, ctx_mask, h, c, *,
             deterministic: bool = True):
        """One decode step: word (B,) int32 -> logits (B, V)."""
        x = self.embedding(word)
        x = self.drop(x, deterministic=deterministic)
        (h, c), y = self.lstm((h, c), x)
        y = self.drop(y, deterministic=deterministic)
        y, _ = self.attention_layer(y, ctx, ctx_mask)
        y = self.drop(y, deterministic=deterministic)
        logit = self.projection(y)
        return logit, h, c

    def __call__(self, words, ctx, ctx_mask, h0, c0, *,
                 deterministic: bool = True):
        """Teacher-forced decode over words (B*m, Lw).  The words batch
        may be an integer multiple m of the ctx batch — the beam
        expansion multiplier (reference model.py:1060-1071): each ctx
        row is repeated for its m beams, so beam-expanded word batches
        score against their shared trajectory context."""
        mult = words.shape[0] // ctx.shape[0]
        if mult > 1:
            ctx = jnp.repeat(ctx, mult, axis=0)
            ctx_mask = jnp.repeat(ctx_mask, mult, axis=0)

        def body(mdl, carry, w_t):
            h, c = carry
            logit, h, c = mdl.step(w_t, ctx, ctx_mask, h, c,
                                   deterministic=deterministic)
            return (h, c), logit

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=1, out_axes=1)
        (_, _), logits = scan(self, (h0, c0), words)
        return logits
