"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasa_tpu.ops.adain import _reference as adain_ref
from dasa_tpu.ops.adain import adain_channel_gate
from dasa_tpu.ops.shift_attention import _reference as shift_ref
from dasa_tpu.ops.shift_attention import shift_attend


def test_adain_gate_matches_reference():
    rng = np.random.default_rng(0)
    b, l, c = 3, 36, 128
    f = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.float32)
    bb = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    noise = jnp.asarray(rng.random(c) > 0.3, jnp.float32) / 0.7
    out = adain_channel_gate(f, d, w, bb, noise, True)
    ref = adain_ref(f.reshape(-1, c), d.reshape(-1, c), w, bb,
                    noise).reshape(b, l, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_adain_gate_grads_match():
    rng = np.random.default_rng(1)
    c = 32
    f = jnp.asarray(rng.standard_normal((2, 4, c)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((2, 4, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bb = jnp.zeros(c)

    def loss_k(f, d, w, bb):
        return adain_channel_gate(f, d, w, bb, None, True).sum()

    def loss_r(f, d, w, bb):
        return adain_ref(f.reshape(-1, c), d.reshape(-1, c), w, bb,
                         None).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(f, d, w, bb)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(f, d, w, bb)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_shift_attend_matches_reference():
    rng = np.random.default_rng(2)
    b, t, c, hdim, ks = 4, 36, 64, 48, 5
    h = jnp.asarray(rng.standard_normal((b, hdim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((hdim, c)) * 0.1, jnp.float32)
    w_s = jnp.asarray(rng.standard_normal((hdim, ks)) * 0.1, jnp.float32)
    b_s = jnp.asarray(rng.standard_normal(ks) * 0.1, jnp.float32)
    out, logit = shift_attend(h, ctx, w_in, w_s, b_s, True)
    ref_out, ref_logit = shift_ref(h, ctx, w_in, w_s, b_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logit), np.asarray(ref_logit),
                               rtol=2e-4, atol=2e-5)


def test_shift_attend_grads_match():
    rng = np.random.default_rng(3)
    b, t, c, hdim, ks = 2, 36, 16, 8, 3
    h = jnp.asarray(rng.standard_normal((b, hdim)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((hdim, c)) * 0.1, jnp.float32)
    w_s = jnp.asarray(rng.standard_normal((hdim, ks)) * 0.1, jnp.float32)
    b_s = jnp.zeros(ks)

    def loss_k(*a):
        out, _ = shift_attend(*a, True)
        return (out ** 2).sum()

    def loss_r(*a):
        out, _ = shift_ref(*a)
        return (out ** 2).sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(h, ctx, w_in, w_s, b_s)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(h, ctx, w_in, w_s, b_s)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
