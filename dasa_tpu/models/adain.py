"""Depth-guided AdaIN feature modulation.

The DASA "channel" module (reference: agent_dg.py:1513-1547) computes
a = act(W_a d), b = W_b d and returns a*f + b; ablation variants use a
content-style bank (COCO), mean pooling, or [mean,std,max,min] stats
(agent_dg.py:1566-1661).  `adaptive_instance_normalization` is the
parameter-free token-wise renormalization (model.py:1822-1841).
gumbel_sigmoid matches r2r_src/gumbel.py:18-30 incl. the hard-threshold
test mode and the straight-through estimator.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dasa_tpu.models.layers import MLP

Dtype = Any


def gumbel_sigmoid(logits, rng: Optional[jax.Array], tau: float = 1.0,
                   hard: bool = True, eps: float = 1e-10,
                   test: bool = False):
    if test:
        return (jax.nn.sigmoid(logits) > 0.5).astype(logits.dtype)
    u = jax.random.uniform(rng, logits.shape, logits.dtype)
    noise = jnp.log(eps + u) - jnp.log(1.0 - u + eps)
    y_soft = jax.nn.sigmoid((logits + noise) / tau)
    if hard:
        y_hard = (y_soft > 0.5).astype(logits.dtype)
        return y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y_soft


def adaptive_instance_normalization(content, style, eps: float = 1e-5):
    """Per-sample (over the 36-token axis) renormalization of content to
    style statistics (model.py:1822-1841)."""
    c_mean = content.mean(axis=1, keepdims=True)
    c_std = content.std(axis=1, keepdims=True) + eps
    s_mean = style.mean(axis=1, keepdims=True)
    s_std = style.std(axis=1, keepdims=True)
    return (content - c_mean) / c_std * s_std + s_mean


class DGAdaChannel(nn.Module):
    """Learned channel modulation a*f + b with a/b predicted from the
    style (depth) features (agent_dg.py:1513-1547).  ab_type selects which
    of a/b exist; a_type applies sigmoid or gumbel-sigmoid to the gate."""

    channel: int
    ab_type: str = "ab"          # ab | a | b
    a_type: Optional[str] = None  # sigmoid | gumbel_sigmoid | None
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, f_t, d_t, *, is_test: bool = True,
                 gumbel_rng: Optional[jax.Array] = None):
        f_t = f_t.astype(self.dtype)
        d_t = d_t.astype(self.dtype)
        if (self.use_pallas and self.ab_type == "a"
                and self.a_type == "sigmoid"):
            # fused Pallas path for the published config (param names
            # match nn.Dense for checkpoint interchange)
            from dasa_tpu.ops.adain import adain_channel_gate

            kernel = self.param(
                "a_fc/kernel", nn.initializers.lecun_normal(),
                (self.channel, self.channel))
            bias = self.param("a_fc/bias", nn.initializers.zeros,
                              (self.channel,))
            return adain_channel_gate(f_t, d_t, kernel, bias, None)
        a = jnp.ones((), self.dtype)
        b = jnp.zeros((), self.dtype)
        if self.ab_type in ("ab", "a"):
            a = nn.Dense(self.channel, dtype=self.dtype, name="a_fc")(d_t)
        if self.ab_type in ("ab", "b"):
            b = nn.Dense(self.channel, dtype=self.dtype, name="b_fc")(d_t)
        if self.a_type == "sigmoid":
            a = jax.nn.sigmoid(a)
        elif self.a_type == "gumbel_sigmoid":
            a = gumbel_sigmoid(a, gumbel_rng, hard=True, test=is_test)
        return a * f_t + b


class DGAdaCOCOChannel(nn.Module):
    """Content-style MLP fusion with a learned style-bank token
    (agent_dg.py:1566-1617)."""

    channel: int
    ab_type: str = "ab"
    a_type: Optional[str] = None
    mid_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f_t, d_t, *, is_test: bool = True,
                 gumbel_rng: Optional[jax.Array] = None):
        f_t = f_t.astype(self.dtype)
        d_t = d_t.astype(self.dtype)
        batch, length, _ = f_t.shape
        csb_dim = self.channel // 4
        a = jnp.ones((), self.dtype)
        b = jnp.zeros((), self.dtype)

        def branch(prefix):
            content = MLP(self.mid_dim, self.channel, self.dtype,
                          name=f"{prefix}_fc_content")(f_t)
            csb = self.param(f"{prefix}_csb", nn.initializers.normal(1.0),
                             (1, 1, csb_dim))
            csb = jnp.broadcast_to(csb.astype(self.dtype),
                                   (batch, length, csb_dim))
            style = MLP(self.mid_dim, self.channel, self.dtype,
                        name=f"{prefix}_fc_style")(
                jnp.concatenate([d_t, csb], axis=-1))
            return MLP(self.mid_dim, self.channel, self.dtype,
                       name=f"{prefix}_fc_fuse")(content * style)

        if self.ab_type in ("ab", "a"):
            a = branch("a")
        if self.ab_type in ("ab", "b"):
            b = branch("b")
        if self.a_type == "sigmoid":
            a = jax.nn.sigmoid(a)
        elif self.a_type == "gumbel_sigmoid":
            a = gumbel_sigmoid(a, gumbel_rng, hard=True, test=is_test)
        return a * f_t + b


class DGAdaMeanChannel(nn.Module):
    """a/b from mean-pooled depth (agent_dg.py:1620-1636)."""

    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f_t, d_t, **_):
        f_t = f_t.astype(self.dtype)
        d_mean = d_t.astype(self.dtype).mean(axis=1)
        a = nn.Dense(self.channel, dtype=self.dtype, name="a_fc")(d_mean)
        b = nn.Dense(self.channel, dtype=self.dtype, name="b_fc")(d_mean)
        return a[:, None, :] * f_t + b[:, None, :]


class DGAdaStatChannel(nn.Module):
    """a/b from [mean, std, max, min] depth stats (agent_dg.py:1639-1661)."""

    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, f_t, d_t, **_):
        f_t = f_t.astype(self.dtype)
        d_t = d_t.astype(self.dtype)
        stats = jnp.concatenate(
            [d_t.mean(axis=1), d_t.std(axis=1, ddof=1),
             d_t.max(axis=1), d_t.min(axis=1)], axis=-1)
        a = nn.Dense(self.channel, dtype=self.dtype, name="a_fc")(stats)
        b = nn.Dense(self.channel, dtype=self.dtype, name="b_fc")(stats)
        return a[:, None, :] * f_t + b[:, None, :]


def make_adain(adain_type: str, channel: int, ab_type: str, a_type,
               dtype=jnp.float32, use_pallas: bool = False
               ) -> Optional[nn.Module]:
    """Module factory mirroring agent init (agent_dg.py:196-209)."""
    if adain_type in ("channel", "rgb_channel"):
        return DGAdaChannel(channel, ab_type, a_type, dtype, use_pallas)
    if adain_type == "coco_channel":
        return DGAdaCOCOChannel(channel, ab_type, a_type, dtype=dtype)
    if adain_type in ("meanchannel", "rgb_meanchannel"):
        return DGAdaMeanChannel(channel, dtype)
    if adain_type in ("rgb_stat_channel", "depth_stat_channel"):
        return DGAdaStatChannel(channel, dtype)
    return None
