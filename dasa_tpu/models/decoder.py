"""Action decoders and the A2C critic.

Single-step modules; the agent drives them from a host loop (acting) or a
`lax.scan` replay (training).  Reference: r2r_src/model.py:358-574
(AttnDecoderLSTM / BAttnDecoderLSTM), 970-982 (Critic).

Design notes vs the reference:
- env dropout is functional (explicit RNG / injected shared noise mask)
  instead of in-place tensor mutation (model.py:506-508);
- the consistent-dropout noises (model.py:468-470) are inputs, not module
  state, so acting and scan-replay reproduce identical values.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.layers import (
    LstmCell,
    ShiftSoftDotAttention,
    SoftDotAttention,
)

Dtype = Any


def drop_visual(x, angle_feat_size: int, rate: float, rng, deterministic):
    """Dropout on the visual channels only, keeping the trailing angle
    features intact (model.py:506-508)."""
    if deterministic or rate == 0.0:
        return x
    visual = x[..., :-angle_feat_size]
    keep = jax.random.bernoulli(rng, 1.0 - rate, visual.shape)
    visual = jnp.where(keep, visual / (1.0 - rate), 0.0)
    return jnp.concatenate([visual, x[..., -angle_feat_size:]], axis=-1)


class Critic(nn.Module):
    """2-layer value head (model.py:970-982)."""

    dim: int
    dropout_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, state, *, deterministic: bool = True):
        x = nn.Dense(self.dim, dtype=self.dtype)(state.astype(self.dtype))
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype)(x).squeeze(-1)


class BAttnDecoderLSTM(nn.Module):
    """The DASA action decoder step (model.py:422-574).

    One step: angle-embed the previous action, attend over the (possibly
    shift-smoothed) panorama, LSTMCell, attend over the instruction ctx,
    then score candidates; optional back-logit head.
    """

    embedding_size: int         # aemb
    hidden_size: int            # d_hidden_size
    dropout_ratio: float
    featdropout: float
    feature_size: int           # visual+angle (2176)
    angle_feat_size: int
    ctx_dim: int                # instruction ctx dim (2 * hidden in DASA)
    use_shift: bool = False
    shift_kernel_size: int = 3
    pred_back: bool = False
    back_input: str = "pre"     # pre | cur
    use_dyrelu: bool = False    # agent_dyrelu: language-conditioned
                                # DyReLU on candidate features
                                # (model.py:1713-1817)
    pred_pm: bool = False       # progress-monitor head (model.py:449-458)
    pm_type: str = "att"        # att | att_hid | plain_att | plain_att_hid
    max_input: int = 80         # pm attention-width (args.maxInput)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.embedding = nn.Dense(self.embedding_size, dtype=self.dtype)
        self.lstm = LstmCell(self.hidden_size,
                             self.embedding_size + self.feature_size,
                             self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)
        if self.use_dyrelu:
            from dasa_tpu.models.variants import lang_dyrelu_c

            visual = self.feature_size - self.angle_feat_size
            self.dyrelu1 = lang_dyrelu_c(visual, dtype=self.dtype)
        if self.use_shift:
            self.feat_att_layer = ShiftSoftDotAttention(
                self.hidden_size, self.feature_size, self.shift_kernel_size,
                self.dtype, self.use_pallas)
        else:
            self.feat_att_layer = SoftDotAttention(
                self.hidden_size, self.feature_size, self.dtype)
        self.attention_layer = SoftDotAttention(
            self.hidden_size, self.ctx_dim, self.dtype)
        self.candidate_att_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)
        if self.pred_back:
            self.back_candidate_att_layer = SoftDotAttention(
                self.hidden_size, self.feature_size, self.dtype)
        if self.pred_pm:
            # sigmoid progress regressor on the (resampled) instruction
            # attention, optionally concatenated with the decoder hidden
            # (model.py:449-458)
            self.pm_critic = nn.Dense(1, dtype=self.dtype)

    def _pm_score(self, alpha, ctx_mask, h_tilde_drop):
        """Progress-monitor score (model.py:533-553).  For the "att"
        family the per-sample valid prefix of the instruction attention
        is linearly resampled (align_corners) to max_input columns and
        renormalized; "plain_att" uses the raw padded attention.  Note:
        the reference's F.mse_loss call broadcasts its (B,1) output
        against a (B,) target; we return (B,) and the agent computes the
        intended elementwise MSE."""
        L = alpha.shape[1]
        alpha = alpha.astype(self.dtype)
        if self.pm_type in ("att", "att_hid"):
            if ctx_mask is None:
                attw = alpha
            else:
                ln = jnp.maximum(
                    (~ctx_mask).sum(axis=-1), 2).astype(self.dtype)
                pos = (jnp.arange(L, dtype=self.dtype)[None, :]
                       * (ln[:, None] - 1.0) / max(L - 1, 1))
                lo = jnp.floor(pos).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, L - 1)
                frac = (pos - lo).astype(self.dtype)
                a_lo = jnp.take_along_axis(alpha, lo, axis=1)
                a_hi = jnp.take_along_axis(alpha, hi, axis=1)
                attw = a_lo * (1.0 - frac) + a_hi * frac
            attw = attw / (attw.sum(-1, keepdims=True) + 1e-10)
        else:  # plain_att | plain_att_hid: zero-padded raw attention
            attw = alpha
        if L < self.max_input:
            attw = jnp.pad(attw, ((0, 0), (0, self.max_input - L)))
        if self.pm_type in ("att_hid", "plain_att_hid"):
            attw = jnp.concatenate([attw, h_tilde_drop], axis=-1)
        return jax.nn.sigmoid(self.pm_critic(attw))[:, 0]

    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx,
                 ctx_mask=None, *, deterministic: bool = True,
                 already_dropfeat: bool = False,
                 input_noise: Optional[jnp.ndarray] = None,
                 output_noise: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, Dict[str, jnp.ndarray]]:
        """action (B, A); feature (B, 36, F); cand_feat (B, K, F);
        prev_h1/c_0 (B, H); ctx (B, L, C); ctx_mask True = masked.
        Returns (h_1, c_1, logit, h_tilde, aux)."""
        aux: Dict[str, jnp.ndarray] = {}
        drop = lambda x, name: self.drop(  # noqa: E731
            x, deterministic=deterministic)

        action_embeds = jnp.tanh(self.embedding(action.astype(self.dtype)))
        action_embeds = drop(action_embeds, "a")

        if not already_dropfeat and not deterministic:
            feature = drop_visual(
                feature, self.angle_feat_size, self.featdropout,
                self.make_rng("dropout"), deterministic)

        prev_h1_drop = drop(prev_h1, "h1")
        attn_feat, _ = self.feat_att_layer(prev_h1_drop, feature,
                                           output_tilde=False)
        concat_input = jnp.concatenate(
            [action_embeds, attn_feat.astype(self.dtype)], axis=-1)
        (h_1, c_1), _ = self.lstm((prev_h1.astype(self.dtype),
                                   c_0.astype(self.dtype)), concat_input)

        if input_noise is not None:
            h_1_drop = h_1 * input_noise
        else:
            h_1_drop = drop(h_1, "h")
        h_tilde, alpha = self.attention_layer(h_1_drop, ctx, ctx_mask)

        if output_noise is not None:
            h_tilde_drop = h_tilde * output_noise
        else:
            h_tilde_drop = drop(h_tilde, "ht")

        if self.pred_pm:
            aux["pm_score"] = self._pm_score(alpha, ctx_mask, h_tilde_drop)

        if not already_dropfeat and not deterministic:
            cand_feat = drop_visual(
                cand_feat, self.angle_feat_size, self.featdropout,
                self.make_rng("dropout"), deterministic)

        if self.use_dyrelu:
            # candidate visual features pass through a DyReLU whose
            # piecewise-linear coefficients come from the max-pooled
            # panorama (model.py:1793-1802)
            a = self.angle_feat_size
            max_feat = jnp.max(feature[..., :-a], axis=1)
            cand_view = self.dyrelu1(cand_feat[..., :-a], max_feat)
            cand_feat = jnp.concatenate(
                [cand_view, cand_feat[..., -a:]], axis=-1)

        _, logit = self.candidate_att_layer(h_tilde_drop, cand_feat,
                                            output_tilde=False,
                                            output_prob=False)
        if self.pred_back:
            back_q = prev_h1 if self.back_input == "pre" else h_tilde_drop
            _, back_logit = self.back_candidate_att_layer(
                back_q, cand_feat, output_tilde=False, output_prob=False)
            aux["back_logit"] = back_logit
        aux["alpha"] = alpha
        return h_1, c_1, logit, h_tilde, aux


class AttnDecoderLSTM(nn.Module):
    """Baseline decoder step, no shift/back heads (model.py:358-420).
    Instruction ctx attention at hidden_size (not 2x)."""

    embedding_size: int
    hidden_size: int
    dropout_ratio: float
    featdropout: float
    feature_size: int
    angle_feat_size: int
    ctx_dim: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Dense(self.embedding_size, dtype=self.dtype)
        self.lstm = LstmCell(self.hidden_size,
                             self.embedding_size + self.feature_size,
                             self.dtype)
        self.drop = nn.Dropout(self.dropout_ratio)
        self.feat_att_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)
        self.attention_layer = SoftDotAttention(
            self.hidden_size, self.ctx_dim, self.dtype)
        self.candidate_att_layer = SoftDotAttention(
            self.hidden_size, self.feature_size, self.dtype)

    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx,
                 ctx_mask=None, *, deterministic: bool = True,
                 already_dropfeat: bool = False, **_):
        drop = lambda x: self.drop(  # noqa: E731
            x, deterministic=deterministic)
        action_embeds = jnp.tanh(self.embedding(action.astype(self.dtype)))
        action_embeds = drop(action_embeds)
        if not already_dropfeat and not deterministic:
            feature = drop_visual(feature, self.angle_feat_size,
                                  self.featdropout, self.make_rng("dropout"),
                                  deterministic)
        prev_h1_drop = drop(prev_h1)
        attn_feat, _ = self.feat_att_layer(prev_h1_drop, feature,
                                           output_tilde=False)
        concat_input = jnp.concatenate(
            [action_embeds, attn_feat.astype(self.dtype)], axis=-1)
        (h_1, c_1), _ = self.lstm((prev_h1.astype(self.dtype),
                                   c_0.astype(self.dtype)), concat_input)
        h_1_drop = drop(h_1)
        h_tilde, _ = self.attention_layer(h_1_drop, ctx, ctx_mask)
        h_tilde_drop = drop(h_tilde)
        if not already_dropfeat and not deterministic:
            cand_feat = drop_visual(cand_feat, self.angle_feat_size,
                                    self.featdropout,
                                    self.make_rng("dropout"), deterministic)
        _, logit = self.candidate_att_layer(h_tilde_drop, cand_feat,
                                            output_tilde=False,
                                            output_prob=False)
        return h_1, c_1, logit, h_tilde, {}
