"""Pretraining models: MLM + next-action (+ progress) heads on DicModel.

Reference: r2r_src/r2rpretrain_class.py — DicAddActionPreTrain (106-147):
BertOnlyMLMHead with weights tied to the word embeddings + a 36-way
next-action classifier over the pooled CLS; DicPMActionPreTrain
(150-235) adds a progress-regression head.  Heads from vilmodel.py:
375-441 (transform = dense+gelu+LN, tied decoder + free bias).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.bert import BertConfig, DicModel

Dtype = Any


class BertMLMHead(nn.Module):
    """transform (dense+gelu+LN) then tied-embedding decoder + bias."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, embeddings):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform")(
            hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        bias = self.param("bias", nn.initializers.zeros,
                          (cfg.vocab_size,))
        return embeddings.attend(x) + bias


class NextActionPrediction(nn.Module):
    """Linear classifier over the discretized 36-view action space
    (r2rpretrain_class.py:649-663)."""

    action_space: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.action_space, dtype=self.dtype)(x)


class DicAddActionPreTrain(nn.Module):
    config: BertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = DicModel(self.config, self.dtype)
        self.mlmhead = BertMLMHead(self.config, self.dtype)
        self.next_action = NextActionPrediction(self.config.action_space,
                                                self.dtype)

    def __call__(self, seq, labels, actions=None, img_feats=None,
                 lang_mask=None, isnext=None, next_img=None, *,
                 deterministic: bool = True):
        """seq (B, L) masked tokens; labels (B, L) original ids at masked
        positions, -1 elsewhere; actions (B,) int or None; img_feats
        (B, 36, F).  Returns (loss, mlm_logits, action_logits).

        isnext/next_img add the reference's NSP-style objective
        (pretrain_class.py:120-140 + batch_loader.py:419-432): next_img
        is the true next-step pano (isnext=1) or a fake same-viewpoint
        pano from another view index (isnext=0), scored as CE of the
        action classifier against the binary label — the reference
        reuses NextActionPrediction as the isnext head, so classes 0/1
        of the 36-way head carry the decision."""
        ctx, pooled, _ = self.bert(seq, att_mask=lang_mask,
                                   img_feats=img_feats,
                                   deterministic=deterministic)
        mlm_logits = self.mlmhead(ctx, self.bert.embeddings).astype(
            jnp.float32)
        logp = jax.nn.log_softmax(mlm_logits, axis=-1)
        safe = jnp.maximum(labels, 0)
        ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        w = (labels >= 0).astype(jnp.float32)
        mask_loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)

        action_logits = self.next_action(pooled).astype(jnp.float32)
        loss = mask_loss
        if actions is not None:
            alogp = jax.nn.log_softmax(action_logits, axis=-1)
            a_ce = -jnp.take_along_axis(
                alogp, jnp.maximum(actions, 0)[:, None], axis=-1)[:, 0]
            aw = (actions >= 0).astype(jnp.float32)
            loss = loss + (a_ce * aw).sum() / jnp.maximum(aw.sum(), 1.0)
        if isnext is not None:
            _, pooled_n, _ = self.bert(seq, att_mask=lang_mask,
                                       img_feats=next_img,
                                       deterministic=deterministic)
            n_logits = self.next_action(pooled_n).astype(jnp.float32)
            nlogp = jax.nn.log_softmax(n_logits, axis=-1)
            n_ce = -jnp.take_along_axis(
                nlogp, isnext[:, None], axis=-1)[:, 0]
            loss = loss + n_ce.mean()
            return loss, mlm_logits, action_logits, n_logits
        return loss, mlm_logits, action_logits


class DicPMActionPreTrain(nn.Module):
    """Adds a sigmoid progress-regression head on the pooled CLS
    (r2rpretrain_class.py:150-235)."""

    config: BertConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = DicModel(self.config, self.dtype)
        self.mlmhead = BertMLMHead(self.config, self.dtype)
        self.next_action = NextActionPrediction(self.config.action_space,
                                                self.dtype)
        self.pm_head = nn.Dense(1, dtype=self.dtype)

    def __call__(self, seq, labels, actions=None, progress=None,
                 img_feats=None, lang_mask=None, *,
                 deterministic: bool = True):
        ctx, pooled, _ = self.bert(seq, att_mask=lang_mask,
                                   img_feats=img_feats,
                                   deterministic=deterministic)
        mlm_logits = self.mlmhead(ctx, self.bert.embeddings).astype(
            jnp.float32)
        logp = jax.nn.log_softmax(mlm_logits, axis=-1)
        safe = jnp.maximum(labels, 0)
        ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        w = (labels >= 0).astype(jnp.float32)
        loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
        action_logits = self.next_action(pooled).astype(jnp.float32)
        if actions is not None:
            alogp = jax.nn.log_softmax(action_logits, axis=-1)
            a_ce = -jnp.take_along_axis(
                alogp, jnp.maximum(actions, 0)[:, None], axis=-1)[:, 0]
            aw = (actions >= 0).astype(jnp.float32)
            loss = loss + (a_ce * aw).sum() / jnp.maximum(aw.sum(), 1.0)
        pm = jax.nn.sigmoid(self.pm_head(pooled)[:, 0]).astype(jnp.float32)
        if progress is not None:
            loss = loss + jnp.mean((pm - progress) ** 2)
        return loss, mlm_logits, action_logits, pm
