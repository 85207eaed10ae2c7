"""Model unit tests: shapes, masking semantics, shift-attention math,
AdaIN behavior, and LSTM packed-sequence equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasa_tpu.config import Config
from dasa_tpu.models import DasaPolicy, DecoderState, StepInputs
from dasa_tpu.models.adain import (
    DGAdaChannel,
    adaptive_instance_normalization,
    gumbel_sigmoid,
)
from dasa_tpu.models.layers import (
    LSTM,
    BiLSTM,
    ShiftSoftDotAttention,
    SoftDotAttention,
)


def small_cfg(**kw):
    base = dict(
        rnn_dim=32, wemb=16, aemb=8, critic_dim=32, angle_feat_size=8,
        feature_size=24, max_input=12, max_candidates=6,
        dropout=0.5, featdropout=0.3,
        d_enc_hidden_size=16, d_hidden_size=32, d_vl_layers=1, d_la_layers=1,
    )
    base.update(kw)
    return Config(**base)


def make_inputs(cfg, b=2, k=6):
    rng = np.random.default_rng(0)
    F = cfg.feature_all_size
    return StepInputs(
        action_feat=jnp.asarray(rng.normal(size=(b, cfg.angle_feat_size)),
                                jnp.float32),
        f_t=jnp.asarray(rng.normal(size=(b, 36, F)), jnp.float32),
        d_t=jnp.asarray(rng.normal(size=(b, 36, F)), jnp.float32),
        cand_feat=jnp.asarray(rng.normal(size=(b, k, F)), jnp.float32),
        cand_dfeat=jnp.asarray(rng.normal(size=(b, k, F)), jnp.float32),
        cand_mask=jnp.zeros((b, k), bool).at[:, 4:].set(True),
        cand_idx=jnp.asarray(rng.integers(0, 36, size=(b, k)), jnp.int32),
    )


def test_masked_lstm_matches_manual_packing():
    """Final carry must equal the state at each row's last valid token."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, 4)), jnp.float32)
    lengths = np.array([5, 2, 3])
    mask = jnp.asarray(np.arange(5)[None, :] < lengths[:, None])
    m = LSTM(6)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    ys, (h, c) = m.apply(params, x, mask)
    # row 1: re-run with only its valid prefix
    ys2, (h2, c2) = m.apply(params, x[1:2, :2], jnp.ones((1, 2), bool))
    np.testing.assert_allclose(h[1], h2[0], rtol=1e-6)
    np.testing.assert_allclose(c[1], c2[0], rtol=1e-6)
    np.testing.assert_allclose(ys[1, :2], ys2[0], rtol=1e-6)
    assert np.allclose(ys[1, 2:], 0.0)  # padded outputs zeroed


def test_bilstm_backward_ignores_padding():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 4)), jnp.float32)
    lengths = np.array([6, 3])
    mask = jnp.asarray(np.arange(6)[None, :] < lengths[:, None])
    m = BiLSTM(5)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    ctx, (h, c) = m.apply(params, x, mask)
    ctx2, (h2, c2) = m.apply(params, x[1:2, :3], jnp.ones((1, 3), bool))
    np.testing.assert_allclose(h[1], h2[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ctx[1, :3], ctx2[0], rtol=1e-5, atol=1e-6)


def test_soft_dot_attention_masking():
    m = SoftDotAttention(8, 12)
    h = jnp.ones((2, 8))
    ctx = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 12)),
                      jnp.float32)
    mask = jnp.zeros((2, 5), bool).at[:, 3:].set(True)
    params = m.init(jax.random.PRNGKey(0), h, ctx, mask)
    _, attn = m.apply(params, h, ctx, mask)
    assert np.allclose(np.asarray(attn[:, 3:]), 0.0)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-6)


def test_shift_attention_conserves_mass_and_matches_manual_conv():
    """The circular shift conv must preserve total attention mass and
    equal an explicit per-sample cross-correlation (model.py:337-343)."""
    b, n, c, ks = 3, 36, 16, 5
    m = ShiftSoftDotAttention(8, c, kernel_size=ks)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(b, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), h, ctx)
    weighted, attn = m.apply(params, h, ctx, output_tilde=False)
    assert weighted.shape == (b, c)
    # reproduce: smoothed = circular conv of softmax attn rows
    p = params["params"]
    target = h @ p["linear_in"]["kernel"]
    logit = np.einsum("btc,bc->bt", np.asarray(ctx), np.asarray(target))
    a = jax.nn.softmax(jnp.asarray(logit), -1).reshape(b, 3, 12)
    kern = jax.nn.softmax(h @ p["linear_shift"]["kernel"]
                          + p["linear_shift"]["bias"], -1)
    pad = ks // 2
    ring = jnp.concatenate([a[:, :, -pad:], a, a[:, :, :pad]], -1)
    sm = sum(ring[:, :, i:i + 12] * kern[:, i][:, None, None]
             for i in range(ks))
    np.testing.assert_allclose(
        np.asarray(sm.sum((-1, -2))), 1.0, rtol=1e-5)  # mass conserved
    expected = np.einsum("bt,btc->bc", np.asarray(sm.reshape(b, n)),
                         np.asarray(ctx))
    np.testing.assert_allclose(np.asarray(weighted), expected, rtol=1e-4,
                               atol=1e-5)


def test_adain_channel_ab_types():
    f = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8)),
                    jnp.float32)
    d = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 8)),
                    jnp.float32)
    m = DGAdaChannel(8, ab_type="a", a_type="sigmoid")
    params = m.init(jax.random.PRNGKey(0), f, d)
    out = m.apply(params, f, d)
    assert out.shape == f.shape
    # a in (0,1) and b=0 => |out| <= |f|
    assert (np.abs(np.asarray(out)) <= np.abs(np.asarray(f)) + 1e-6).all()
    # parameter-free adain maps content to style statistics
    out2 = adaptive_instance_normalization(f, d)
    np.testing.assert_allclose(np.asarray(out2.mean(1)),
                               np.asarray(d.mean(1)), atol=1e-4)


def test_gumbel_sigmoid_modes():
    logits = jnp.asarray([[2.0, -2.0], [0.5, -0.5]])
    hard = gumbel_sigmoid(logits, None, test=True)
    np.testing.assert_array_equal(np.asarray(hard), [[1, 0], [1, 0]])
    y = gumbel_sigmoid(logits, jax.random.PRNGKey(0), hard=True, test=False)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


@pytest.mark.parametrize("encoder_type,extra", [
    ("EncoderLSTM", {}),
    ("Dic", dict(include_vision=True, adain_type="channel", ab_type="a",
                 a_type="sigmoid", use_shift=True, shift_kernel_size=5,
                 d_reverse_input=True)),
])
def test_policy_forward_shapes(encoder_type, extra):
    cfg = small_cfg(encoder_type=encoder_type, **extra)
    b, k, L = 2, 6, 12
    vocab = 50
    policy = DasaPolicy(cfg, vocab_size=vocab)
    instr = jnp.asarray(
        np.random.default_rng(0).integers(1, vocab, size=(b, L)))
    valid = jnp.ones((b, L), bool).at[:, 8:].set(False)
    seq_len = jnp.full((b,), 8, jnp.int32)
    inputs = make_inputs(cfg, b, k)
    params = policy.init(jax.random.PRNGKey(0), instr, valid, seq_len,
                         inputs)
    logit, v = jax.jit(policy.apply)(params, instr, valid, seq_len, inputs)
    assert logit.shape == (b, k)
    assert v.shape == (b,)
    assert np.isfinite(np.asarray(logit)).all()


def test_policy_text_cache_exactness():
    """With update_lang_bert=False and no dropout, cached text stack +
    per-step cross forward == the reference's full per-step re-encode."""
    cfg = small_cfg(encoder_type="Dic", include_vision=True)
    b, k, L = 2, 6, 12
    policy = DasaPolicy(cfg, vocab_size=0)
    instr = jnp.asarray(
        np.random.default_rng(0).integers(1, 100, size=(b, L)))
    valid = jnp.ones((b, L), bool)
    seq_len = jnp.full((b,), L, jnp.int32)
    inputs = make_inputs(cfg, b, k)
    params = policy.init(jax.random.PRNGKey(0), instr, valid, seq_len,
                         inputs)

    cached = policy.apply(params, instr, valid, seq_len,
                          method=DasaPolicy.encode_text)
    ctx1, h1, c1, _, _ = policy.apply(params, cached, valid, seq_len,
                                   inputs.f_t,
                                   method=DasaPolicy.encode_step)
    cached2 = policy.apply(params, instr, valid, seq_len,
                           method=DasaPolicy.encode_text)
    ctx2, h2, c2, _, _ = policy.apply(params, cached2, valid, seq_len,
                                   inputs.f_t,
                                   method=DasaPolicy.encode_step)
    np.testing.assert_allclose(np.asarray(ctx1), np.asarray(ctx2))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2))

# ---------------------------------------------------------------------------
# Multi* 3-instruction plumbing (reference r2rmodel.py:2709-2820 +
# tasks/R2R/env.py:475-490 + tasks/R2R/model.py:3571-3579)
# ---------------------------------------------------------------------------

def test_expand_instruction_groups():
    from dasa_tpu.data.datasets import expand_instruction_groups
    from dasa_tpu.utils import Tokenizer, build_vocab

    data = [
        {"path_id": 1, "scan": "s", "path": ["a"], "heading": 0.0,
         "instructions": ["go left now", "walk right ahead",
                          "turn around fully", "go straight on"]},
        {"path_id": 2, "scan": "s", "path": ["a"], "heading": 0.0,
         "instructions": ["too few", "instructions here"]},
    ]
    vocab = build_vocab(data, min_count=1)
    tok = Tokenizer(vocab, encoding_length=8)
    groups = expand_instruction_groups(data, tok, max_input=8)
    # C(4,3)=4 groups for item 1; item 2 skipped (< 3 instructions)
    assert len(groups) == 4
    for g in groups:
        assert g["instr_encoding"].shape == (3, 8)
        assert len(g["instructions"]) == 3
    assert groups[0]["instr_id"] == "1_0"


def test_multi_dic_encoder_and_merge():
    from dasa_tpu.models.encoder import (
        DicEncoder,
        MultiDicEncoder,
        merge_sentence_attention,
    )
    from dasa_tpu.models.layers import SoftDotAttention
    from dasa_tpu.models.policy import bert_config_from

    cfg = small_cfg(encoder_type="Dic", include_vision=False)
    bc = bert_config_from(cfg)
    b, s, L = 2, 3, 12
    rng = np.random.default_rng(0)
    one = rng.integers(1, 50, size=(b, 1, L)).astype(np.int32)
    instr = jnp.asarray(np.repeat(one, s, axis=1))  # identical sentences
    valid = instr != 0
    seq_len = valid.sum(-1).astype(jnp.int32)

    enc = MultiDicEncoder(bc, cfg.d_enc_hidden_size, cfg.d_hidden_size,
                          dropout_ratio=0.0)
    params = enc.init(jax.random.PRNGKey(0), instr, valid,
                      method=MultiDicEncoder.text_forward)
    te = enc.apply(params, instr, valid,
                   method=MultiDicEncoder.text_forward)
    params = enc.init(jax.random.PRNGKey(0), te, valid, seq_len)
    ctxs, h0, c0, masks = enc.apply(params, te, valid, seq_len)
    C = cfg.d_enc_hidden_size * 2
    assert ctxs.shape == (b, s, L, C)
    assert h0.shape == (b, cfg.d_hidden_size)
    # identical sentences through shared weights -> identical contexts,
    # and the averaged init equals any single sentence's init
    np.testing.assert_allclose(np.asarray(ctxs[:, 0]),
                               np.asarray(ctxs[:, 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ctxs[:, 1]),
                               np.asarray(ctxs[:, 2]), atol=1e-6)

    att = SoftDotAttention(cfg.d_hidden_size, C)
    h = jnp.asarray(rng.normal(size=(b, cfg.d_hidden_size)), jnp.float32)
    ap = att.init(jax.random.PRNGKey(1), h, ctxs[:, 0], ~valid[:, 0])

    def att_fn(hh, ctx, mask):
        return att.apply(ap, hh, ctx, mask)

    merged, attns = merge_sentence_attention(att_fn, h, ctxs, valid,
                                             merge="mean")
    single, _ = att_fn(h, ctxs[:, 0], ~valid[:, 0])
    np.testing.assert_allclose(np.asarray(merged), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
    cat, _ = merge_sentence_attention(att_fn, h, ctxs, valid, merge="cat")
    assert cat.shape == (b, s * cfg.d_hidden_size)
    mx, _ = merge_sentence_attention(att_fn, h, ctxs, valid, merge="max")
    assert mx.shape == (b, cfg.d_hidden_size)
