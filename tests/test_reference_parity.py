"""Forward-parity against the reference's PyTorch modules.

Loads the actual `r2r_src` torch code (torch 2.x CPU), pushes random
torch weights through `dasa_tpu.utils.torch_import`, and asserts our
Flax modules produce the same outputs on identical inputs — upgrading
"same math" from design intent to verified fact for the checkpoint-
import path (ShiftSoftDotAttention model.py:300-353, BAttnDecoderLSTM
model.py:422-574, DicModel vilmodel.py:1245-1423, DGAdaChannel
agent_dg.py:1513-1547).

The reference imports MatterSim and pytorch_transformers at module
scope; tiny shims stand in for both (the fake simulator only replays
the discretized 36-view sweep utils.py:386-408 uses to build angle
tables).
"""

import math
import os
import sys
import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference/r2r_src"

B, HID, CTXD, FEAT, ANGLE, K, L = 3, 32, 64, 24, 8, 6, 12


class _FakeSim:
    """Replays the reference's discretized 36-view sweep (no rendering,
    no dataset) so utils.py's module-scope ViewHelper can build."""

    def setRenderingEnabled(self, *_):
        pass

    def setCameraResolution(self, *_):
        pass

    def setCameraVFOV(self, *_):
        pass

    def setDiscretizedViewingAngles(self, *_):
        pass

    def init(self):
        pass

    def newEpisode(self, scan, vp, heading, elevation):
        self.heading, self.elevation = heading, elevation

    def makeAction(self, index, h, e):
        self.heading = (self.heading + h * math.pi / 6) % (2 * math.pi)
        self.elevation += e * math.pi / 6

    def getState(self):
        s = types.SimpleNamespace()
        s.heading, s.elevation = self.heading, self.elevation
        s.viewIndex = ((int(round(self.elevation / (math.pi / 6))) + 1) * 12
                       + int(round(self.heading / (math.pi / 6))) % 12)
        return s


@pytest.fixture(scope="module")
def ref():
    """Import the reference r2r_src modules with shims; returns
    (model, vilmodel, agent_dg-classes, args)."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import contextlib
    import io

    argv = sys.argv
    sys.argv = ["parity"]
    ms = types.ModuleType("MatterSim")
    ms.Simulator = _FakeSim
    sys.modules.setdefault("MatterSim", ms)
    ppb = types.ModuleType("pytorch_pretrained_bert")
    fu = types.ModuleType("pytorch_pretrained_bert.file_utils")
    fu.cached_path = lambda *a, **k: None
    ppb.file_utils = fu
    sys.modules.setdefault("pytorch_pretrained_bert", ppb)
    sys.modules.setdefault("pytorch_pretrained_bert.file_utils", fu)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    with contextlib.redirect_stdout(io.StringIO()):
        import param

        import modeling_utils

        class _ShimPreTrained(modeling_utils.PreTrainedModel):
            # the real pytorch_transformers base provides init_weights;
            # a no-op suffices since every weight is overwritten by the
            # translated torch state anyway
            def init_weights(self):
                pass

        pt = types.ModuleType("pytorch_transformers")
        pt.BertPreTrainedModel = _ShimPreTrained
        pt.BertConfig = modeling_utils.PretrainedConfig
        sys.modules.setdefault("pytorch_transformers", pt)
        import model as ref_model
        import vilmodel as ref_vilmodel
    args = param.args
    args.angle_feat_size = ANGLE
    args.featdropout = 0.4
    args.decoder_consistent_drop = False
    args.pred_pm = False
    args.maxInput = L
    sys.argv = argv

    # DGAdaChannel lives in agent_dg.py, which imports the full env
    # stack; extract just the class source and exec it.
    import ast

    src = open(os.path.join(REF, "agent_dg.py")).read()
    tree = ast.parse(src)
    ns = {"torch": torch, "nn": torch.nn, "args": args}
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == "DGAdaChannel":
            exec(compile(ast.Module([node], []), "agent_dg.py", "exec"),
                 ns)
    assert "DGAdaChannel" in ns
    return ref_model, ref_vilmodel, ns, args


def _torch_state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _apply(params, translated, root, allow_missing=()):
    from dasa_tpu.utils.torch_import import apply_translated

    new, missed = apply_translated(params, translated, strict=False,
                                   root=root)
    unexpected = [m for m in missed
                  if not any(a in m for a in allow_missing)]
    assert not unexpected, unexpected
    return new


def test_shift_attention_forward_parity(ref):
    ref_model, _, _, args = ref
    args.use_shift = True
    args.shift_kernel_size = 3
    tm = ref_model.ShiftSoftDotAttention(HID, FEAT + ANGLE, 3)
    tm.eval()

    from dasa_tpu.models.layers import ShiftSoftDotAttention
    from dasa_tpu.utils.torch_import import translate_soft_dot

    fm = ShiftSoftDotAttention(HID, FEAT + ANGLE, 3)
    rng = np.random.default_rng(0)
    h = rng.standard_normal((B, HID)).astype(np.float32)
    ctx = rng.standard_normal((B, 36, FEAT + ANGLE)).astype(np.float32)
    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(h),
                     jnp.asarray(ctx))
    st = {"m." + k: v for k, v in _torch_state(tm).items()}
    tr = translate_soft_dot(st, "m", "")
    tr = {tuple(p for p in k if p): v for k, v in tr.items()}
    params = _apply(params, tr, root=("params",))

    with torch.no_grad():
        t_tilde, t_attn = tm(torch.from_numpy(h), torch.from_numpy(ctx))
    f_tilde, f_attn = fm.apply(params, jnp.asarray(h), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(f_attn), t_attn.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_tilde), t_tilde.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_battn_decoder_forward_parity(ref):
    ref_model, _, _, args = ref
    args.use_shift = True
    args.shift_kernel_size = 3
    tm = ref_model.BAttnDecoderLSTM(8, HID, 0.5,
                                    feature_size=FEAT + ANGLE,
                                    pred_back=True)
    tm.eval()

    from dasa_tpu.models.decoder import BAttnDecoderLSTM
    from dasa_tpu.utils.torch_import import translate_battn_decoder

    fm = BAttnDecoderLSTM(8, HID, 0.5, 0.4, FEAT + ANGLE, ANGLE,
                          ctx_dim=2 * HID, use_shift=True,
                          shift_kernel_size=3, pred_back=True)
    rng = np.random.default_rng(1)
    action = rng.standard_normal((B, ANGLE)).astype(np.float32)
    feat = rng.standard_normal((B, 36, FEAT + ANGLE)).astype(np.float32)
    cand = rng.standard_normal((B, K, FEAT + ANGLE)).astype(np.float32)
    h1 = rng.standard_normal((B, HID)).astype(np.float32)
    c0 = rng.standard_normal((B, HID)).astype(np.float32)
    ctx = rng.standard_normal((B, L, 2 * HID)).astype(np.float32)
    mask = np.zeros((B, L), bool)
    mask[:, 9:] = True

    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(action),
                     jnp.asarray(feat), jnp.asarray(cand),
                     jnp.asarray(h1), jnp.asarray(c0), jnp.asarray(ctx),
                     jnp.asarray(mask))
    tr = translate_battn_decoder(_torch_state(tm))
    # torch's SoftDotAttention instantiates linear_out even where the
    # decoder never calls it with output_tilde=True; our compact modules
    # only create executed params
    params = _apply(params, tr, root=("params",),
                    allow_missing=("feat_att_layer/linear_out",
                                   "candidate_att_layer/linear_out"))

    with torch.no_grad():
        t_h, t_c, t_logit, t_tilde, t_aux = tm(
            torch.from_numpy(action), torch.from_numpy(feat.copy()),
            torch.from_numpy(cand.copy()), torch.from_numpy(h1),
            torch.from_numpy(h1), torch.from_numpy(c0),
            torch.from_numpy(ctx), torch.from_numpy(mask))
    f_h, f_c, f_logit, f_tilde, f_aux = fm.apply(
        params, jnp.asarray(action), jnp.asarray(feat),
        jnp.asarray(cand), jnp.asarray(h1), jnp.asarray(c0),
        jnp.asarray(ctx), jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(f_h), t_h.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_logit), t_logit.numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(f_tilde), t_tilde.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_aux["back_logit"]),
                               t_aux["back_logit"].numpy(), rtol=1e-4,
                               atol=2e-4)


def test_dic_model_forward_parity(ref):
    _, ref_vilmodel, _, args = ref
    import modeling_utils

    tcfg = modeling_utils.PretrainedConfig()
    fields = dict(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, layer_norm_eps=1e-12,
        img_feature_dim=FEAT + ANGLE, img_feature_type="imagenet",
        la_layers=2, vl_layers=1, v_layers=0, update_lang_bert=True,
        update_add_layer=True, hidden_act="gelu",
        initializer_range=0.02, output_attentions=False,
        output_hidden_states=False, num_hidden_layers=2,
        vocab_size_or_config_json_file=64)
    for k, v in fields.items():
        setattr(tcfg, k, v)
    tm = ref_vilmodel.DicModel(tcfg)
    tm.eval()

    from dasa_tpu.models.bert import BertConfig, DicModel
    from dasa_tpu.utils.torch_import import translate_dic_model

    fcfg = BertConfig(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        img_feature_dim=FEAT + ANGLE, la_layers=2, vl_layers=1,
        v_layers=0, update_lang_bert=True, update_add_layer=True)
    fm = DicModel(fcfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 64, size=(B, L)).astype(np.int64)
    att = np.ones((B, L), np.int64)
    att[:, 10:] = 0
    img = rng.standard_normal((B, 36, FEAT + ANGLE)).astype(np.float32)

    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                     jnp.asarray(att, jnp.int32), jnp.asarray(img))
    tr = translate_dic_model(_torch_state(tm))
    params = _apply(params, tr, root=("params",))

    with torch.no_grad():
        # NB: the torch forward's 2nd positional is token_type_ids
        # (vilmodel.py:1328) — attention_mask must go by keyword
        t_seq, t_pooled, t_visn = tm(torch.from_numpy(ids),
                                     attention_mask=torch.from_numpy(att),
                                     img_feats=torch.from_numpy(img))
    f_seq, f_pooled, f_visn = fm.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(att, jnp.int32),
        jnp.asarray(img), deterministic=True)
    np.testing.assert_allclose(np.asarray(f_seq), t_seq.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pooled), t_pooled.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_visn), t_visn.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_dg_ada_channel_forward_parity(ref):
    _, _, ns, args = ref
    args.ab_type = "ab"
    args.a_type = "sigmoid"
    tm = ns["DGAdaChannel"](FEAT)
    tm.eval()

    from dasa_tpu.models.adain import make_adain
    from dasa_tpu.utils.torch_import import translate_linear

    fm = make_adain("channel", FEAT, "ab", "sigmoid", jnp.float32)
    rng = np.random.default_rng(3)
    f_t = rng.standard_normal((B, 36, FEAT)).astype(np.float32)
    d_t = rng.standard_normal((B, 36, FEAT)).astype(np.float32)

    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(f_t),
                     jnp.asarray(d_t))
    st = _torch_state(tm)
    tr = {}
    tr.update(translate_linear(st, "a_fc", "a_fc"))
    tr.update(translate_linear(st, "b_fc", "b_fc"))
    params = _apply(params, tr, root=("params",))

    with torch.no_grad():
        t_out = tm(torch.from_numpy(f_t), torch.from_numpy(d_t))
    f_out = fm.apply(params, jnp.asarray(f_t), jnp.asarray(d_t),
                     is_test=True)
    np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mt_distance_kl_parity(ref):
    """The MT agent's soft-distance KL pieces match the reference:
    view_rel_weight_table == ViewHelper.get_target_rel_weight for every
    target (utils.py:693-702, via the FakeSim-built VHelper), and
    mt_kl_rows reproduces the agent_mt KL arithmetic — masked-weight
    softmax target, boolean element selection, F.kl_div 'mean'
    (agent_mt.py:712-718; get_distance_weight utils.py:703-713 minus
    its .cuda())."""
    import utils as ref_utils

    from dasa_tpu.agents.seq2seq import mt_kl_rows
    from dasa_tpu.utils.angles import view_rel_weight_table

    table = view_rel_weight_table()
    for t in range(36):
        np.testing.assert_allclose(
            table[t], ref_utils.VHelper.get_target_rel_weight(t),
            rtol=1e-5, atol=1e-6)

    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    Bk, K = 6, 7
    cand_n = rng.integers(1, K, size=Bk).astype(np.int32)
    cand_view = rng.integers(0, 36, size=(Bk, K)).astype(np.int32)
    # mostly real teacher moves; row 0 STOP (== cand_n, the reference's
    # ignoreid case) and row 1 ended — both must drop from the KL
    teacher = (rng.integers(0, 100, size=Bk)
               % np.maximum(cand_n, 1)).astype(np.int32)
    teacher[0] = cand_n[0]
    active = np.ones(Bk, bool)
    active[1] = False
    logits = rng.normal(size=(Bk, K)).astype(np.float32)
    slots = np.arange(K)[None, :]
    masked = np.where(slots > cand_n[:, None], -1e9, logits)
    logp = (masked - np.log(np.exp(
        masked - masked.max(-1, keepdims=True)).sum(-1, keepdims=True))
        - masked.max(-1, keepdims=True)).astype(np.float32)
    has_action = active & (teacher < cand_n)

    # --- reference arithmetic (agent_mt.py:712-718) -------------------
    candidate_idx = np.where(slots < cand_n[:, None], cand_view, -1)
    tv = np.where(has_action,
                  np.take_along_axis(
                      cand_view, np.minimum(teacher, K - 1)[:, None],
                      axis=1)[:, 0], -100)
    rows = []
    for t_id, c_ids in zip(tv, candidate_idx):
        w = ref_utils.VHelper.get_target_rel_weight(int(t_id))
        rows.append(w[c_ids])  # -1 wraps, masked_fill overrides below
    r = torch.from_numpy(np.array(rows))
    r.masked_fill_(torch.from_numpy(candidate_idx) == -1, -100000)
    tgt = torch.softmax(r, -1)
    has = torch.from_numpy(has_action)
    ci = torch.from_numpy(candidate_idx)
    sel_logp = torch.from_numpy(logp)[has][ci[has] != -1]
    sel_tgt = tgt[has][ci[has] != -1]
    kl_ref = F.kl_div(sel_logp.double(), sel_tgt.double(),
                      reduction="mean").item()

    kl_row, cnt_row = mt_kl_rows(
        jnp.asarray(logp), jnp.asarray(teacher), jnp.asarray(cand_view),
        jnp.asarray(cand_n), jnp.asarray(has_action))
    ours = float(kl_row.sum() / max(float(cnt_row.sum()), 1.0))
    assert float(cnt_row.sum()) == int((ci[has] != -1).sum())
    np.testing.assert_allclose(ours, kl_ref, rtol=1e-4, atol=1e-6)


def test_vic_model_forward_parity(ref):
    """VicAddActionPreTrain's bert (VicModel, vilmodel.py:1098-1243):
    text BERT named encoder.layer.N + LXRTX addlayers.  Our Vic alias
    is DicModel with la_layers=num_hidden_layers / v_layers=0
    (config.py), imported via translate_vic_model."""
    _, ref_vilmodel, _, args = ref
    import modeling_utils

    tcfg = modeling_utils.PretrainedConfig()
    fields = dict(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, layer_norm_eps=1e-12,
        img_feature_dim=FEAT + ANGLE, img_feature_type="imagenet",
        vl_layers=1, update_lang_bert=True, update_add_layer=True,
        hidden_act="gelu", initializer_range=0.02,
        output_attentions=False, output_hidden_states=False,
        num_hidden_layers=2, vocab_size_or_config_json_file=64)
    for k, v in fields.items():
        setattr(tcfg, k, v)
    tm = ref_vilmodel.VicModel(tcfg)
    tm.eval()

    from dasa_tpu.models.bert import BertConfig, DicModel
    from dasa_tpu.utils.torch_import import translate_vic_model

    fcfg = BertConfig(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        img_feature_dim=FEAT + ANGLE, la_layers=2, vl_layers=1,
        v_layers=0, update_lang_bert=True, update_add_layer=True)
    fm = DicModel(fcfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 64, size=(B, L)).astype(np.int64)
    att = np.ones((B, L), np.int64)
    att[:, 9:] = 0
    img = rng.standard_normal((B, 36, FEAT + ANGLE)).astype(np.float32)

    import jax

    params = fm.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                     jnp.asarray(att, jnp.int32), jnp.asarray(img))
    tr = translate_vic_model(_torch_state(tm))
    params = _apply(params, tr, root=("params",))

    with torch.no_grad():
        t_seq, t_pooled = tm(torch.from_numpy(ids),
                             attention_mask=torch.from_numpy(att),
                             img_feats=torch.from_numpy(img))[:2]
    f_seq, f_pooled, _f_visn = fm.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(att, jnp.int32),
        jnp.asarray(img), deterministic=True)
    np.testing.assert_allclose(np.asarray(f_seq), t_seq.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_pooled), t_pooled.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_bert_add_model_forward_parity(ref):
    """HugAddActionPreTrain's bert (BertAddModel, vilmodel.py:886-1010):
    text stack encoder.layer.N, image projection, joint add-layers over
    [img; text].  Imported onto our legacy BertAddEncoder via
    translate_bert_add_model; parity asserted on the FULL fused joint
    sequence (built from the grafted params via module binding — the
    encoder's own __call__ then feeds it to the fresh top LSTM, which
    the graft intentionally leaves random)."""
    _, ref_vilmodel, _, args = ref
    import modeling_utils

    tcfg = modeling_utils.PretrainedConfig()
    fields = dict(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, layer_norm_eps=1e-12,
        img_feature_dim=FEAT + ANGLE, img_feature_type="imagenet",
        vl_layers=1, update_lang_bert=True, update_add_layer=True,
        hidden_act="gelu", initializer_range=0.02,
        output_attentions=False, output_hidden_states=False,
        num_hidden_layers=2, vocab_size_or_config_json_file=64)
    for k, v in fields.items():
        setattr(tcfg, k, v)
    tm = ref_vilmodel.BertAddModel(tcfg)
    tm.eval()

    import jax

    from dasa_tpu.models.bert import BertConfig, extended_attention_mask
    from dasa_tpu.models.legacy import BertAddEncoder
    from dasa_tpu.utils.torch_import import translate_bert_add_model

    fcfg = BertConfig(
        vocab_size=64, hidden_size=HID, num_attention_heads=4,
        intermediate_size=2 * HID, max_position_embeddings=64,
        img_feature_dim=FEAT + ANGLE, la_layers=2, vl_layers=1,
        update_lang_bert=True, update_add_layer=True)
    fm = BertAddEncoder(bert_config=fcfg, hidden_size=HID,
                        dec_hidden_size=HID, dropout_ratio=0.0)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 64, size=(B, L)).astype(np.int64)
    att = np.ones((B, L), np.int64)
    att[:, 8:] = 0
    img = rng.standard_normal((B, 36, FEAT + ANGLE)).astype(np.float32)
    valid = jnp.asarray(att.astype(bool))
    seq_len = jnp.asarray(att.sum(-1).astype(np.int32))

    def init_both(m, ids, valid, seq_len, img):
        return m(m.text_forward(ids, valid), valid, seq_len, img)

    params = fm.init(jax.random.PRNGKey(0),
                     jnp.asarray(ids, jnp.int32), valid, seq_len,
                     jnp.asarray(img), method=init_both)
    tr = translate_bert_add_model(_torch_state(tm))
    params = _apply(params, tr, root=("params",))

    with torch.no_grad():
        t_seq = tm(torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(att),
                   img_feats=torch.from_numpy(img))[0]

    bound = fm.bind(params)
    text = bound.text_forward(jnp.asarray(ids, jnp.int32), valid)
    img_emb = bound.img_embedding(jnp.asarray(img))
    joint = jnp.concatenate([img_emb, text], axis=1)
    joint_valid = jnp.concatenate(
        [jnp.ones((B, 36), bool), valid], axis=1)
    bias = extended_attention_mask(joint_valid, jnp.float32)
    for layer in bound.add_layers:
        joint = layer(joint, bias, deterministic=True)
    np.testing.assert_allclose(np.asarray(joint), t_seq.numpy(),
                               rtol=1e-3, atol=1e-4)
