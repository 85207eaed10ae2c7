"""MCAN co-attention block tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dasa_tpu.models.mcan import AttFlat, MCASGASGA, McattEncoder, SA


def test_sa_masking_invariance():
    """Masked positions must not influence unmasked outputs."""
    m = SA(hidden_size=16, n_head=4, ff_size=32, dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    mask = jnp.zeros((2, 1, 1, 6), bool).at[:, :, :, 4:].set(True)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out1 = m.apply(params, x, mask)
    x2 = x.at[:, 4:].set(99.0)  # perturb masked positions
    out2 = m.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :4]),
                               np.asarray(out2[:, :4]), atol=1e-5)


def test_mcatt_encoder_shapes():
    m = McattEncoder(vocab_size=50, word_embed_size=12, hidden_size=16,
                     n_head=4, ff_size=32, n_layers=2, img_feat_size=24,
                     flat_mlp_size=16, flat_out_size=16)
    rng = np.random.default_rng(1)
    seq = jnp.asarray(rng.integers(1, 50, (2, 8)), jnp.int32)
    pad = jnp.zeros((2, 8), bool).at[:, 6:].set(True)
    f = jnp.asarray(rng.normal(size=(2, 36, 24)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), seq, pad, f)
    seq_feat, att_txt, v_feat, att_v = m.apply(params, seq, pad, f)
    assert seq_feat.shape == (2, 8, 16)
    assert att_txt.shape == (2, 16)
    assert v_feat.shape == (2, 36, 16)
    assert att_v.shape == (2, 16)
    assert np.isfinite(np.asarray(att_v)).all()


def test_attflat_mask():
    m = AttFlat(hidden_size=8, flat_mlp_size=8, flat_out_size=8,
                dropout=0.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)), jnp.float32)
    mask = jnp.zeros((2, 1, 1, 5), bool).at[:, :, :, 3:].set(True)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    o1 = m.apply(params, x, mask)
    o2 = m.apply(params, x.at[:, 3:].set(-50.0), mask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
