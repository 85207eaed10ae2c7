"""Checkpoint import plumbing: reference-named torch state dicts must map
onto our flax trees with no unmatched paths and exact value transfer."""

import numpy as np
import pytest

from dasa_tpu.config import Config
from dasa_tpu.models import DasaPolicy
from dasa_tpu.utils.torch_import import (
    apply_translated,
    translate_battn_decoder,
    translate_critic,
    translate_dic_encoder,
)

import jax
import jax.numpy as jnp


def build_policy_params():
    cfg = Config(encoder_type="Dic", include_vision=True,
                 adain_type="channel", ab_type="a", a_type="sigmoid",
                 use_shift=True, shift_kernel_size=5, pred_back=True,
                 feature_size=16, angle_feat_size=8, max_input=10,
                 max_candidates=6, d_enc_hidden_size=12, d_hidden_size=20,
                 critic_dim=20, d_la_layers=1, d_vl_layers=1, d_v_layers=1)
    policy = DasaPolicy(cfg, vocab_size=0)
    from dasa_tpu.models import StepInputs

    b, k, L, F = 2, 6, 10, cfg.feature_all_size
    dummy = StepInputs(
        jnp.zeros((b, cfg.angle_feat_size)), jnp.zeros((b, 36, F)),
        jnp.zeros((b, 36, F)), jnp.zeros((b, k, F)),
        jnp.zeros((b, k, F)), jnp.zeros((b, k), bool))
    params = policy.init(jax.random.PRNGKey(0),
                         jnp.zeros((b, L), jnp.int32),
                         jnp.ones((b, L), bool),
                         jnp.full((b,), L, jnp.int32), dummy)
    return cfg, params


def fabricate_torch_state(flax_tree, name_map):
    """Build a torch-named dict whose values are the (inverse-transformed)
    flax leaves + 1.0, so a successful import visibly changes params."""
    state = {}

    def leaf(path):
        node = flax_tree
        for p in path.split("/"):
            node = node[p]
        return np.asarray(node)

    for torch_name, (flax_path, kind) in name_map.items():
        v = leaf(flax_path) + 1.0
        if kind == "linear_w":
            state[torch_name] = v.T
        elif kind == "lstm_b":
            state[torch_name] = v / 2.0  # bias_ih + bias_hh halves
        else:
            state[torch_name] = v
    return state


def test_encoder_import_roundtrip():
    cfg, params = build_policy_params()
    enc = params["params"]["encoder"]
    name_map = {}

    def add_linear(torch_base, flax_base, bias=True):
        name_map[f"{torch_base}.weight"] = (f"{flax_base}/kernel",
                                            "linear_w")
        if bias:
            name_map[f"{torch_base}.bias"] = (f"{flax_base}/bias", "id")

    def add_ln(torch_base, flax_base):
        name_map[f"{torch_base}.weight"] = (f"{flax_base}/scale", "id")
        name_map[f"{torch_base}.bias"] = (f"{flax_base}/bias", "id")

    # bert embeddings / pooler / vision encoder
    for n in ("word_embeddings", "position_embeddings",
              "token_type_embeddings"):
        name_map[f"bert.embeddings.{n}.weight"] = (
            f"bert/embeddings/{n}/embedding", "id")
    add_ln("bert.embeddings.LayerNorm", "bert/embeddings/LayerNorm")
    add_linear("bert.pooler.dense", "bert/pooler/dense")
    add_linear("bert.vision_encoder.visn_fc",
               "bert/vision_encoder/visn_fc")
    add_ln("bert.vision_encoder.visn_layer_norm",
           "bert/vision_encoder/visn_layer_norm")

    def add_bert_layer(tc, fx):
        for qkv in ("query", "key", "value"):
            add_linear(f"{tc}.attention.self.{qkv}",
                       f"{fx}/attention/self/{qkv}")
        add_linear(f"{tc}.attention.output.dense",
                   f"{fx}/attention/output/dense")
        add_ln(f"{tc}.attention.output.LayerNorm",
               f"{fx}/attention/output/LayerNorm")
        add_linear(f"{tc}.intermediate.dense", f"{fx}/intermediate/dense")
        add_linear(f"{tc}.output.dense", f"{fx}/output/dense")
        add_ln(f"{tc}.output.LayerNorm", f"{fx}/output/LayerNorm")

    add_bert_layer("bert.lalayer.0", "bert/lalayer_0")
    add_bert_layer("bert.vlayer.0", "bert/vlayer_0")
    base, fx = "bert.addlayer.0", "bert/addlayer_0"
    for qkv in ("query", "key", "value"):
        add_linear(f"{base}.visual_attention.att.{qkv}",
                   f"{fx}/visual_attention/att/{qkv}")
    add_linear(f"{base}.visual_attention.output.dense",
               f"{fx}/visual_attention/output/dense")
    add_ln(f"{base}.visual_attention.output.LayerNorm",
           f"{fx}/visual_attention/output/LayerNorm")
    for stream in ("lang_self_att", "visn_self_att"):
        for qkv in ("query", "key", "value"):
            add_linear(f"{base}.{stream}.self.{qkv}",
                       f"{fx}/{stream}/self/{qkv}")
        add_linear(f"{base}.{stream}.output.dense",
                   f"{fx}/{stream}/output/dense")
        add_ln(f"{base}.{stream}.output.LayerNorm",
               f"{fx}/{stream}/output/LayerNorm")
    for stream in ("lang", "visn"):
        add_linear(f"{base}.{stream}_inter.dense",
                   f"{fx}/{stream}_inter/dense")
        add_linear(f"{base}.{stream}_output.dense",
                   f"{fx}/{stream}_output/dense")
        add_ln(f"{base}.{stream}_output.LayerNorm",
               f"{fx}/{stream}_output/LayerNorm")
    # top LSTM + projections
    for d, fdir in (("", "fwd_cell"), ("_reverse", "bwd_cell")):
        name_map[f"lstm.weight_ih_l0{d}"] = (
            f"lstm/{fdir}/wi", "linear_w")
        name_map[f"lstm.weight_hh_l0{d}"] = (
            f"lstm/{fdir}/wh", "linear_w")
        name_map[f"lstm.bias_ih_l0{d}"] = (
            f"lstm/{fdir}/b", "lstm_b")
        name_map[f"lstm.bias_hh_l0{d}"] = (
            f"lstm/{fdir}/b", "lstm_b")
    # flax materializes params lazily: with top_lstm=True only the
    # lstm2decoder projections exist (the reference creates all four
    # eagerly; unused ones are simply skipped at import)
    for n in ("encoder_lstm2decoder_ht", "encoder_lstm2decoder_ct"):
        add_linear(n, n)

    state = fabricate_torch_state(enc, name_map)
    translated = translate_dic_encoder(state)
    new_params, missed = apply_translated(
        params, translated, root=("params", "encoder"))
    assert missed == [], missed
    # verify a few leaves actually moved by +1 (transposed back)
    old = np.asarray(enc["bert"]["pooler"]["dense"]["kernel"])
    new = np.asarray(
        new_params["params"]["encoder"]["bert"]["pooler"]["dense"]
        ["kernel"])
    np.testing.assert_allclose(new, old + 1.0, atol=1e-6)
    old_wi = np.asarray(enc["lstm"]["fwd_cell"]["wi"])
    new_wi = np.asarray(
        new_params["params"]["encoder"]["lstm"]["fwd_cell"]["wi"])
    np.testing.assert_allclose(new_wi, old_wi + 1.0, atol=1e-6)


def test_decoder_critic_import():
    cfg, params = build_policy_params()
    dec = params["params"]["decoder"]
    name_map = {}
    name_map["embedding.0.weight"] = ("embedding/kernel", "linear_w")
    name_map["embedding.0.bias"] = ("embedding/bias", "id")
    name_map["lstm.weight_ih"] = ("lstm/wi", "linear_w")
    name_map["lstm.weight_hh"] = ("lstm/wh", "linear_w")
    name_map["lstm.bias_ih"] = ("lstm/b", "lstm_b")
    name_map["lstm.bias_hh"] = ("lstm/b", "lstm_b")
    for att in ("feat_att_layer", "attention_layer",
                "candidate_att_layer", "back_candidate_att_layer"):
        name_map[f"{att}.linear_in.weight"] = (
            f"{att}/linear_in/kernel", "linear_w")
    # only the instruction attention runs with output_tilde=True, so only
    # it materializes linear_out (lazily-created flax params)
    name_map["attention_layer.linear_out.weight"] = (
        "attention_layer/linear_out/kernel", "linear_w")
    name_map["feat_att_layer.linear_shift.weight"] = (
        "feat_att_layer/linear_shift/kernel", "linear_w")
    name_map["feat_att_layer.linear_shift.bias"] = (
        "feat_att_layer/linear_shift/bias", "id")

    state = fabricate_torch_state(dec, name_map)
    translated = translate_battn_decoder(state)
    new_params, missed = apply_translated(params, translated,
                                          root=("params", "decoder"))
    assert missed == [], missed

    crit = params["params"]["critic"]
    cmap = {
        "state2value.0.weight": ("Dense_0/kernel", "linear_w"),
        "state2value.0.bias": ("Dense_0/bias", "id"),
        "state2value.3.weight": ("Dense_1/kernel", "linear_w"),
        "state2value.3.bias": ("Dense_1/bias", "id"),
    }
    cstate = fabricate_torch_state(crit, cmap)
    new_params, missed = apply_translated(
        params, translate_critic(cstate), root=("params", "critic"))
    assert missed == [], missed


def build_bert_add_params():
    from dasa_tpu.models.bert import BertConfig
    from dasa_tpu.models.legacy import BertAddEncoder

    fcfg = BertConfig(
        vocab_size=32, hidden_size=16, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=32,
        img_feature_dim=24, la_layers=1, vl_layers=1)
    fm = BertAddEncoder(bert_config=fcfg, hidden_size=12,
                        dec_hidden_size=20, dropout_ratio=0.0)
    ids = jnp.zeros((2, 8), jnp.int32)
    valid = jnp.ones((2, 8), bool)

    def init_both(m, ids, valid):
        return m(m.text_forward(ids, valid), valid,
                 jnp.full((2,), 8, jnp.int32), jnp.zeros((2, 36, 24)))

    return fm.init(jax.random.PRNGKey(0), ids, valid, method=init_both)


def test_bert_add_encoder_import_roundtrip():
    """The BertAddActionPreTrain family's encoder checkpoint
    (r2rmodel.py BertAddEncoder: HF BertModel under .bert + joint
    add-layers + top LSTM + decoder-init projections) maps fully onto
    our legacy BertAddEncoder INCLUDING the tail."""
    from dasa_tpu.utils.torch_import import translate_bert_add_encoder

    params = build_bert_add_params()
    enc = params["params"]
    name_map = {}

    def add_linear(torch_base, flax_base, bias=True):
        name_map[f"{torch_base}.weight"] = (f"{flax_base}/kernel",
                                            "linear_w")
        if bias:
            name_map[f"{torch_base}.bias"] = (f"{flax_base}/bias", "id")

    def add_ln(torch_base, flax_base):
        name_map[f"{torch_base}.weight"] = (f"{flax_base}/scale", "id")
        name_map[f"{torch_base}.bias"] = (f"{flax_base}/bias", "id")

    def add_bert_layer(tc, fx):
        for qkv in ("query", "key", "value"):
            add_linear(f"{tc}.attention.self.{qkv}",
                       f"{fx}/attention/self/{qkv}")
        add_linear(f"{tc}.attention.output.dense",
                   f"{fx}/attention/output/dense")
        add_ln(f"{tc}.attention.output.LayerNorm",
               f"{fx}/attention/output/LayerNorm")
        add_linear(f"{tc}.intermediate.dense", f"{fx}/intermediate/dense")
        add_linear(f"{tc}.output.dense", f"{fx}/output/dense")
        add_ln(f"{tc}.output.LayerNorm", f"{fx}/output/LayerNorm")

    for n in ("word_embeddings", "position_embeddings",
              "token_type_embeddings"):
        name_map[f"bert.embeddings.{n}.weight"] = (
            f"embeddings/{n}/embedding", "id")
    add_ln("bert.embeddings.LayerNorm", "embeddings/LayerNorm")
    add_bert_layer("bert.encoder.layer.0", "text_0")
    add_bert_layer("addlayer.layer.0", "add_0")
    add_linear("img_embedding", "img_embedding")
    for d, fdir in (("", "fwd_cell"), ("_reverse", "bwd_cell")):
        name_map[f"lstm.weight_ih_l0{d}"] = (
            f"tail/lstm/{fdir}/wi", "linear_w")
        name_map[f"lstm.weight_hh_l0{d}"] = (
            f"tail/lstm/{fdir}/wh", "linear_w")
        name_map[f"lstm.bias_ih_l0{d}"] = (f"tail/lstm/{fdir}/b",
                                           "lstm_b")
        name_map[f"lstm.bias_hh_l0{d}"] = (f"tail/lstm/{fdir}/b",
                                           "lstm_b")
    add_linear("encoder_lstm2decoder_ht", "tail/encoder2decoder_ht")
    add_linear("encoder_lstm2decoder_ct", "tail/encoder2decoder_ct")

    state = fabricate_torch_state(enc, name_map)
    translated = translate_bert_add_encoder(state)
    new_params, missed = apply_translated(params, translated,
                                          root=("params",))
    assert missed == [], missed
    old = np.asarray(enc["img_embedding"]["kernel"])
    new = np.asarray(new_params["params"]["img_embedding"]["kernel"])
    np.testing.assert_allclose(new, old + 1.0, atol=1e-6)
    old_wi = np.asarray(enc["tail"]["lstm"]["fwd_cell"]["wi"])
    new_wi = np.asarray(
        new_params["params"]["tail"]["lstm"]["fwd_cell"]["wi"])
    np.testing.assert_allclose(new_wi, old_wi + 1.0, atol=1e-6)


def test_detect_pretrain_family():
    from dasa_tpu.utils.torch_import import detect_pretrain_family

    dic = {"lalayer.0.attention.self.query.weight": 0,
           "addlayer.0.visual_attention.att.query.weight": 0}
    vic = {"encoder.layer.0.attention.self.query.weight": 0,
           "addlayer.0.visual_attention.att.query.weight": 0,
           "vision_encoder.visn_fc.weight": 0}
    hug = {"encoder.layer.0.attention.self.query.weight": 0,
           "addlayer.layer.0.attention.self.query.weight": 0,
           "img_embedding.weight": 0}
    badd = {"bert.encoder.layer.0.attention.self.query.weight": 0,
            "addlayer.layer.0.attention.self.query.weight": 0,
            "lstm.weight_ih_l0": 0,
            "encoder_lstm2decoder_ht.weight": 0}
    assert detect_pretrain_family(dic) == "dic"
    assert detect_pretrain_family(vic) == "vic"
    assert detect_pretrain_family(hug) == "hugadd"
    assert detect_pretrain_family(badd) == "bertadd_encoder"
    with pytest.raises(ValueError):
        detect_pretrain_family({"something.weight": 0})
