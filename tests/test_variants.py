"""Variant-module tests: DyReLU piecewise behavior, fusion shapes,
double decoder logit summation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasa_tpu.models.variants import (
    DoubleBAttnDecoderLSTM,
    MLBFusion,
    MutanFusion,
    lang_dyrelu_a,
    lang_dyrelu_c,
)


def test_dyrelu_reduces_to_relu_at_zero_theta():
    """With fc2 output forced to 0 (theta=0 after 2*sigmoid(0)-1=0), the
    coefficients become (a1,a2)=(1,0), (b1,b2)=(0,0) so
    out = max(x, 0) = ReLU (dyrelu.py lambdas/init_v)."""
    m = lang_dyrelu_a(channels=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)),
                    jnp.float32)
    q = jnp.zeros((2, 6))
    params = m.init(jax.random.PRNGKey(0), x, q)
    # zero fc2 so theta == 0
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = m.apply(params, x, q)
    np.testing.assert_allclose(np.asarray(out),
                               np.maximum(np.asarray(x), 0), atol=1e-6)


def test_dyrelu_per_channel_shapes():
    m = lang_dyrelu_c(channels=8)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 4, 8)),
                    jnp.float32)
    q = jnp.asarray(np.random.default_rng(2).normal(size=(3, 10)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, q)
    out = m.apply(params, x, q)
    assert out.shape == x.shape
    # piecewise max of affine fns is always >= each piece at k=1 slot
    assert np.isfinite(np.asarray(out)).all()


def test_fusions():
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(4, 12)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32)
    mlb = MLBFusion(dim_h=16)
    p = mlb.init(jax.random.PRNGKey(0), v, q)
    out = mlb.apply(p, v, q)
    assert out.shape == (4, 16)
    mutan = MutanFusion(dim_hv=10, dim_hq=10, dim_mm=16, rank=3)
    p = mutan.init(jax.random.PRNGKey(0), v, q)
    out = mutan.apply(p, v, q)
    assert out.shape == (4, 16)
    assert (np.abs(np.asarray(out)) <= 1.0 + 1e-6).all()  # tanh range


def test_double_decoder_sums_logits():
    b, k, F, A, H, L, C = 2, 5, 24, 8, 16, 6, 32
    m = DoubleBAttnDecoderLSTM(8, H, 0.0, 0.0, F, A, ctx_dim=C)
    rng = np.random.default_rng(4)
    args = (
        jnp.asarray(rng.normal(size=(b, A)), jnp.float32),      # action
        jnp.asarray(rng.normal(size=(b, 36, F)), jnp.float32),  # feature
        jnp.asarray(rng.normal(size=(b, 36, F)), jnp.float32),  # dfeature
        jnp.asarray(rng.normal(size=(b, k, F)), jnp.float32),   # cand
        jnp.asarray(rng.normal(size=(b, k, F)), jnp.float32),   # cand_d
        jnp.zeros((b, H)), jnp.zeros((b, H)),
        jnp.zeros((b, H)), jnp.zeros((b, H)),
        jnp.asarray(rng.normal(size=(b, L, C)), jnp.float32),   # ctx
    )
    params = m.init(jax.random.PRNGKey(0), *args)
    (h, c, h1), (hd, cd, h1d), logit, aux = m.apply(params, *args)
    assert logit.shape == (b, k)
    assert h.shape == (b, H) and hd.shape == (b, H)
    # the two decoders have independent params => different streams
    assert not np.allclose(np.asarray(h), np.asarray(hd))

def test_encoder_type_aliases():
    """Legacy-zoo encoder spellings resolve to the equivalent built
    stacks (docs/DATA_LIMITS.md mapping)."""
    from dasa_tpu.config import Config

    c = Config(encoder_type="VicEncoder")
    assert c.encoder_type == "Dic" and c.d_la_layers == 12 \
        and c.d_v_layers == 0
    # BertLang/HugAdd keep the fused image rows in ctx == BertAdd
    # (r2rmodel.py:1906-2061, 1331-1461); HugLang is text-only
    # (r2rmodel.py:814-900); BertMix strips the image rows after fusion
    # and is its own type (r2rmodel.py:1776)
    assert Config(encoder_type="BertLang").encoder_type == "BertAdd"
    assert Config(encoder_type="HugLang").encoder_type == "BEncoder"
    assert Config(encoder_type="BertMix").encoder_type == "BertMix"
    assert Config(encoder_type="HugAdd").encoder_type == "BertAdd"
    assert Config(encoder_type="vlbert").encoder_type == "BertImg"
    assert Config(encoder_type="DicEncoder").encoder_type == "Dic"
    assert Config(encoder_type="Dic").encoder_type == "Dic"
