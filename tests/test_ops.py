"""Pallas kernel equivalence tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasa_tpu.ops.adain import _reference as adain_ref
from dasa_tpu.ops.adain import adain_channel_gate
from dasa_tpu.ops.lstm import lstm_scan, lstm_scan_ref
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

def _lstm_inputs(seed=4, t=7, b=3, h=8, mask_tail=True):
    rng = np.random.default_rng(seed)
    xw = jnp.asarray(rng.standard_normal((t, b, 4 * h)) * 0.5, jnp.float32)
    mask = np.ones((t, b), np.float32)
    if mask_tail:  # ragged: rows end at different tokens
        for j in range(b):
            mask[t - 1 - j % 3:, j] = 0.0
    mask = jnp.asarray(mask)
    h0 = jnp.asarray(rng.standard_normal((b, h)) * 0.3, jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((b, h)) * 0.3, jnp.float32)
    wh = jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.2, jnp.float32)
    return xw, mask, h0, c0, wh


def test_lstm_scan_matches_reference():
    xw, mask, h0, c0, wh = _lstm_inputs()
    h_seq, c_seq = lstm_scan(xw, mask, h0, c0, wh, True)
    rh, rc = lstm_scan_ref(xw, mask, h0, c0, wh)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(rh),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_seq), np.asarray(rc),
                               rtol=1e-5, atol=1e-6)
    # masked tokens pass the carry through
    m = np.asarray(mask)
    hs = np.asarray(h_seq)
    for j in range(hs.shape[1]):
        dead = np.nonzero(m[:, j] == 0)[0]
        for t_i in dead:
            prev = hs[t_i - 1, j] if t_i > 0 else np.asarray(h0)[j]
            np.testing.assert_allclose(hs[t_i, j], prev, rtol=1e-6)


def test_lstm_scan_grads_match():
    xw, mask, h0, c0, wh = _lstm_inputs(seed=5, t=6, b=2, h=4)

    def loss_k(xw, h0, c0, wh):
        h_seq, c_seq = lstm_scan(xw, mask, h0, c0, wh, True)
        ys = h_seq * mask[..., None]
        return (ys ** 2).sum() + (h_seq[-1] ** 3).sum() + c_seq[-1].sum()

    def loss_r(xw, h0, c0, wh):
        h_seq, c_seq = lstm_scan_ref(xw, mask, h0, c0, wh)
        ys = h_seq * mask[..., None]
        return (ys ** 2).sum() + (h_seq[-1] ** 3).sum() + c_seq[-1].sum()

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(xw, h0, c0, wh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(xw, h0, c0, wh)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)


def test_bilstm_pallas_path_matches_xla():
    """The module-level pallas=True path reproduces the fused einsum
    scan (same params, same masked ctx/finals)."""
    from dasa_tpu.models.layers import LSTM, BiLSTM

    rng = np.random.default_rng(6)
    b, t, d, h = 2, 5, 6, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    mask = jnp.asarray(
        np.arange(t)[None, :] < np.array([[t], [t - 2]]), bool
    ).reshape(b, t)
    mod = BiLSTM(h)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    ctx_x, (h_x, c_x) = mod.apply(params, x, mask)
    ctx_p, (h_p, c_p) = mod.apply(params, x, mask, pallas=True)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=1e-5, atol=1e-6)

    uni = LSTM(h)
    params_u = uni.init(jax.random.PRNGKey(1), x, mask)
    ys_x, car_x = uni.apply(params_u, x, mask)
    ys_p, car_p = uni.apply(params_u, x, mask, pallas=True)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x),
                               rtol=1e-5, atol=1e-6)
    for a, b_ in zip(car_p, car_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
