"""Import reference PyTorch checkpoints into dasa_tpu Flax params.

Covers the two checkpoint families a DASA user has on disk:

1. the PREVALENT-style pretrained encoder (HF `save_pretrained` dir with
   pytorch_model.bin holding DicAddActionPreTrain; consumed by the
   listener via `encoder.bert = premodel.bert`, agent_dg.py:135-188),
2. the released listener checkpoints (per-component dicts
   {encoder,decoder,critic,adaIn} each with state_dict,
   agent_dg.py:1466-1510).

Conventions: torch Linear.weight (out,in) -> flax kernel (in,out)
transposed; LayerNorm.weight -> scale; Embedding.weight -> embedding;
torch LSTM/LSTMCell weight_ih (4H,in) -> our LstmCell wi (in,4H)
transposed, with bias = bias_ih + bias_hh (same i,f,g,o gate order).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x):
    return np.asarray(x).T


def _id(x):
    return np.asarray(x)


# (torch suffix, flax leaf, transform)
_LINEAR = [("weight", "kernel", _t), ("bias", "bias", _id)]
_LAYERNORM = [("weight", "scale", _id), ("bias", "bias", _id)]
_EMBED = [("weight", "embedding", _id)]


def translate_dic_model(state: Dict[str, np.ndarray],
                        prefix: str = "") -> Dict[Tuple[str, ...], np.ndarray]:
    """Map a torch DicModel state_dict (vilmodel.py:1245-1423 naming) to
    flax path tuples under our DicModel."""
    out: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path, leaves, torch_base):
        for suf, leaf, tf in leaves:
            key = f"{torch_base}.{suf}"
            if key in state:
                out[tuple(path.split("/")) + (leaf,)] = tf(state[key])

    # embeddings
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings"):
        put(f"embeddings/{name}", _EMBED, f"{prefix}embeddings.{name}")
    put("embeddings/LayerNorm", _LAYERNORM, f"{prefix}embeddings.LayerNorm")
    put("pooler/dense", _LINEAR, f"{prefix}pooler.dense")
    put("vision_encoder/visn_fc", _LINEAR,
        f"{prefix}vision_encoder.visn_fc")
    put("vision_encoder/visn_layer_norm", _LAYERNORM,
        f"{prefix}vision_encoder.visn_layer_norm")

    def bert_layer(fx, tc):
        for qkv in ("query", "key", "value"):
            put(f"{fx}/attention/self/{qkv}", _LINEAR,
                f"{tc}.attention.self.{qkv}")
        put(f"{fx}/attention/output/dense", _LINEAR,
            f"{tc}.attention.output.dense")
        put(f"{fx}/attention/output/LayerNorm", _LAYERNORM,
            f"{tc}.attention.output.LayerNorm")
        put(f"{fx}/intermediate/dense", _LINEAR, f"{tc}.intermediate.dense")
        put(f"{fx}/output/dense", _LINEAR, f"{tc}.output.dense")
        put(f"{fx}/output/LayerNorm", _LAYERNORM, f"{tc}.output.LayerNorm")

    def attn_block(fx, tc, core):
        for qkv in ("query", "key", "value"):
            put(f"{fx}/{core}/{qkv}", _LINEAR, f"{tc}.{core}.{qkv}"
                if core == "self" else f"{tc}.att.{qkv}")
        put(f"{fx}/output/dense", _LINEAR, f"{tc}.output.dense")
        put(f"{fx}/output/LayerNorm", _LAYERNORM, f"{tc}.output.LayerNorm")

    i = 0
    while f"{prefix}lalayer.{i}.attention.self.query.weight" in state:
        bert_layer(f"lalayer_{i}", f"{prefix}lalayer.{i}")
        i += 1
    i = 0
    while f"{prefix}vlayer.{i}.attention.self.query.weight" in state:
        bert_layer(f"vlayer_{i}", f"{prefix}vlayer.{i}")
        i += 1
    i = 0
    while (f"{prefix}addlayer.{i}.visual_attention.att.query.weight"
           in state):
        base = f"{prefix}addlayer.{i}"
        fx = f"addlayer_{i}"
        attn_block(f"{fx}/visual_attention", f"{base}.visual_attention",
                   "att")
        attn_block(f"{fx}/lang_self_att", f"{base}.lang_self_att", "self")
        attn_block(f"{fx}/visn_self_att", f"{base}.visn_self_att", "self")
        put(f"{fx}/lang_inter/dense", _LINEAR, f"{base}.lang_inter.dense")
        put(f"{fx}/visn_inter/dense", _LINEAR, f"{base}.visn_inter.dense")
        put(f"{fx}/lang_output/dense", _LINEAR, f"{base}.lang_output.dense")
        put(f"{fx}/lang_output/LayerNorm", _LAYERNORM,
            f"{base}.lang_output.LayerNorm")
        put(f"{fx}/visn_output/dense", _LINEAR, f"{base}.visn_output.dense")
        put(f"{fx}/visn_output/LayerNorm", _LAYERNORM,
            f"{base}.visn_output.LayerNorm")
        i += 1
    return out


def _put_into(out, state, path, leaves, torch_base):
    for suf, leaf, tf in leaves:
        key = f"{torch_base}.{suf}"
        if key in state:
            out[tuple(path.split("/")) + (leaf,)] = tf(state[key])


def _bert_layer_into(out, state, flax_base, torch_base):
    """One BertLayer (attention/self + output + intermediate + output)."""
    for qkv in ("query", "key", "value"):
        _put_into(out, state, f"{flax_base}/attention/self/{qkv}",
                  _LINEAR, f"{torch_base}.attention.self.{qkv}")
    _put_into(out, state, f"{flax_base}/attention/output/dense",
              _LINEAR, f"{torch_base}.attention.output.dense")
    _put_into(out, state, f"{flax_base}/attention/output/LayerNorm",
              _LAYERNORM, f"{torch_base}.attention.output.LayerNorm")
    _put_into(out, state, f"{flax_base}/intermediate/dense", _LINEAR,
              f"{torch_base}.intermediate.dense")
    _put_into(out, state, f"{flax_base}/output/dense", _LINEAR,
              f"{torch_base}.output.dense")
    _put_into(out, state, f"{flax_base}/output/LayerNorm", _LAYERNORM,
              f"{torch_base}.output.LayerNorm")


def _embeddings_into(out, state, torch_prefix=""):
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings"):
        _put_into(out, state, f"embeddings/{name}", _EMBED,
                  f"{torch_prefix}embeddings.{name}")
    _put_into(out, state, "embeddings/LayerNorm", _LAYERNORM,
              f"{torch_prefix}embeddings.LayerNorm")


def translate_vic_model(state: Dict[str, np.ndarray]
                        ) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch VicModel (vilmodel.py:1098-1243) -> our Vic-aliased
    DicModel flax paths.  VicModel is the full 12-layer text BERT
    (named ``encoder.layer.N``) + LXRTX addlayers; our Vic alias builds
    DicModel with d_la_layers=12 / d_v_layers=0 (config.py), so the
    text stack renames onto ``lalayer.N`` and the rest reuses the
    DicModel map (embeddings / pooler / vision_encoder / addlayer)."""
    renamed = {}
    for k, v in state.items():
        if k.startswith("encoder.layer."):
            k = "lalayer." + k[len("encoder.layer."):]
        renamed[k] = v
    return translate_dic_model(renamed)


def translate_bert_add_model(state: Dict[str, np.ndarray]
                             ) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch BertAddModel (vilmodel.py:886-1010, the HugAdd pretrain
    family's bert) -> our legacy BertAddEncoder flax paths
    (models/legacy.py): text stack ``encoder.layer.N`` -> ``text_N``,
    joint ``addlayer.layer.N`` -> ``add_N``, plus embeddings and the
    image projection.  The torch pooler has no analog (our tail is the
    top LSTM, randomly initialized on graft — same as the reference
    keeping its top LSTM fresh after ``encoder.bert = premodel.bert``).
    """
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    _embeddings_into(out, state)
    _put_into(out, state, "img_embedding", _LINEAR, "img_embedding")
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state:
        _bert_layer_into(out, state, f"text_{i}", f"encoder.layer.{i}")
        i += 1
    i = 0
    while f"addlayer.layer.{i}.attention.self.query.weight" in state:
        _bert_layer_into(out, state, f"add_{i}", f"addlayer.layer.{i}")
        i += 1
    return out


def translate_bert_add_encoder(state: Dict[str, np.ndarray]
                               ) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch BertAddEncoder (r2rmodel.py — the legacy-zoo encoder the
    BertAddActionPreTrain family wraps): HF BertModel under ``bert.``
    + ``addlayer.layer.N`` + top LSTM + decoder-init projections ->
    our legacy BertAddEncoder INCLUDING the tail (this family's
    checkpoint carries the whole encoder, unlike the bert-only HF
    formats).  torch ``encoder_lstm2decoder_{ht,ct}`` (the top_lstm
    path, r2rmodel.py) land on the tail's ``encoder2decoder_{ht,ct}``.
    """
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    _embeddings_into(out, state, torch_prefix="bert.")
    _put_into(out, state, "img_embedding", _LINEAR, "img_embedding")
    i = 0
    while f"bert.encoder.layer.{i}.attention.self.query.weight" in state:
        _bert_layer_into(out, state, f"text_{i}",
                         f"bert.encoder.layer.{i}")
        i += 1
    i = 0
    while f"addlayer.layer.{i}.attention.self.query.weight" in state:
        _bert_layer_into(out, state, f"add_{i}", f"addlayer.layer.{i}")
        i += 1
    if "lstm.weight_ih_l0" in state:
        bidir = "lstm.weight_ih_l0_reverse" in state
        out.update(translate_lstm(state, "lstm", "tail/lstm", bidir))
    for tc, fx in (("encoder_lstm2decoder_ht", "tail/encoder2decoder_ht"),
                   ("encoder_lstm2decoder_ct",
                    "tail/encoder2decoder_ct")):
        if f"{tc}.weight" in state:
            out.update(translate_linear(state, tc, fx))
    return out


def detect_pretrain_family(bert_state: Dict[str, np.ndarray]) -> str:
    """Classify a pretrain checkpoint's ``bert.*`` sub-dict by its key
    structure (the four families of r2rpretrain_class.py)."""
    keys = bert_state.keys()
    if any(k.startswith("lalayer.") for k in keys):
        return "dic"                   # DicAdd / DicPM (DicModel)
    if any(k.startswith("bert.encoder.layer.") for k in keys) \
            or "lstm.weight_ih_l0" in keys:
        return "bertadd_encoder"       # BertAdd* (r2rmodel encoder)
    if any(k.startswith("addlayer.layer.") for k in keys):
        return "hugadd"                # HugAdd (vilmodel BertAddModel)
    if any(".visual_attention." in k for k in keys):
        return "vic"                   # Vic (vilmodel VicModel)
    raise ValueError(
        f"unrecognized pretrain checkpoint family; sample keys: "
        f"{sorted(keys)[:8]}")


def translate_lstm(state: Dict[str, np.ndarray], torch_base: str,
                   flax_base: str, bidirectional: bool
                   ) -> Dict[Tuple[str, ...], np.ndarray]:
    """torch nn.LSTM (single layer) -> our LSTM/BiLSTM cell params."""
    out = {}

    def one(dir_suffix, cell_path):
        wi = state[f"{torch_base}.weight_ih_l0{dir_suffix}"]
        wh = state[f"{torch_base}.weight_hh_l0{dir_suffix}"]
        b = (np.asarray(state[f"{torch_base}.bias_ih_l0{dir_suffix}"])
             + np.asarray(state[f"{torch_base}.bias_hh_l0{dir_suffix}"]))
        base = tuple(flax_base.split("/")) + cell_path
        out[base + ("wi",)] = _t(wi)
        out[base + ("wh",)] = _t(wh)
        out[base + ("b",)] = b

    if bidirectional:  # BiLSTM owns its direction cells directly
        one("", ("fwd_cell",))
        one("_reverse", ("bwd_cell",))
    else:
        one("", ("LstmCell_0",))
    return out


def translate_lstm_cell(state, torch_base: str, flax_base: str):
    wi = state[f"{torch_base}.weight_ih"]
    wh = state[f"{torch_base}.weight_hh"]
    b = (np.asarray(state[f"{torch_base}.bias_ih"])
         + np.asarray(state[f"{torch_base}.bias_hh"]))
    base = tuple(flax_base.split("/"))
    return {base + ("wi",): _t(wi), base + ("wh",): _t(wh),
            base + ("b",): b}


def translate_linear(state, torch_base: str, flax_base: str,
                     bias: bool = True):
    out = {}
    base = tuple(flax_base.split("/"))
    out[base + ("kernel",)] = _t(state[f"{torch_base}.weight"])
    if bias and f"{torch_base}.bias" in state:
        out[base + ("bias",)] = _id(state[f"{torch_base}.bias"])
    return out


def translate_soft_dot(state, torch_base: str, flax_base: str):
    out = {}
    out.update(translate_linear(state, f"{torch_base}.linear_in",
                                f"{flax_base}/linear_in", bias=False))
    if f"{torch_base}.linear_out.weight" in state:
        out.update(translate_linear(state, f"{torch_base}.linear_out",
                                    f"{flax_base}/linear_out", bias=False))
    if f"{torch_base}.linear_shift.weight" in state:
        out.update(translate_linear(state, f"{torch_base}.linear_shift",
                                    f"{flax_base}/linear_shift"))
    return out


def translate_battn_decoder(state: Dict[str, np.ndarray],
                            prefix: str = "") -> Dict:
    """BAttnDecoderLSTM state_dict (model.py:422-574) -> flax paths under
    our decoder."""
    out = {}
    out.update(translate_linear(state, f"{prefix}embedding.0", "embedding"))
    out.update(translate_lstm_cell(state, f"{prefix}lstm", "lstm"))
    for name in ("feat_att_layer", "attention_layer",
                 "candidate_att_layer", "back_candidate_att_layer"):
        if f"{prefix}{name}.linear_in.weight" in state:
            out.update(translate_soft_dot(state, f"{prefix}{name}", name))
    return out


def translate_critic(state, prefix: str = "") -> Dict:
    out = {}
    out.update(translate_linear(state, f"{prefix}state2value.0", "Dense_0"))
    out.update(translate_linear(state, f"{prefix}state2value.3", "Dense_1"))
    return out


def translate_dic_encoder(state, prefix: str = "") -> Dict:
    """DicEncoder state_dict (r2rmodel.py:2199-2365) -> encoder subtree."""
    out = {}
    bert = translate_dic_model(
        {k[len(prefix) + 5:]: v for k, v in state.items()
         if k.startswith(f"{prefix}bert.")})
    out.update({("bert",) + k: v for k, v in bert.items()})
    if f"{prefix}lstm.weight_ih_l0" in state:
        bidir = f"{prefix}lstm.weight_ih_l0_reverse" in state
        out.update(translate_lstm(state, f"{prefix}lstm", "lstm", bidir))
    for name in ("encoder2decoder_ht", "encoder2decoder_ct",
                 "encoder_lstm2decoder_ht", "encoder_lstm2decoder_ct",
                 "ctx_v_to_v"):
        if f"{prefix}{name}.weight" in state:
            out.update(translate_linear(state, f"{prefix}{name}", name))
    return out


def apply_translated(params: Dict, translated: Dict[Tuple[str, ...], np.ndarray],
                     strict: bool = False,
                     root: Tuple[str, ...] = (),
                     row_slice_embeddings: bool = False) -> Tuple[Dict, list]:
    """Write translated leaves into a (nested-dict) flax param tree,
    returning (new_tree, list of missed paths).  Shapes must match;
    with `row_slice_embeddings`, an ``embedding`` leaf may differ from
    the target in ROW COUNT only: a source with more rows keeps its
    leading rows (the Pretrainer's vocab appends <MASK>), a source with
    fewer rows overwrites the target's leading rows (the listener's
    DicModel keeps the 30522-row BERT table while our Pretrainer sizes
    it to the word vocab; token ids are shared-prefix either way)."""
    import copy

    new = copy.deepcopy(params)
    missed = []
    for path, value in translated.items():
        node = new
        full = root + path
        ok = True
        for p in full[:-1]:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        leaf = full[-1]
        if not ok or not isinstance(node, dict) or leaf not in node:
            missed.append("/".join(full))
            continue
        cur = node[leaf]
        if tuple(np.shape(cur)) != tuple(value.shape):
            cur_shape = tuple(np.shape(cur))
            if (row_slice_embeddings and leaf == "embedding"
                    and value.ndim == len(cur_shape) == 2
                    and value.shape[1] == cur_shape[1]):
                if value.shape[0] > cur_shape[0]:
                    value = value[:cur_shape[0]]
                else:
                    merged = np.array(cur, copy=True)
                    merged[:value.shape[0]] = value.astype(merged.dtype)
                    value = merged
            else:
                missed.append("/".join(full) +
                              f" shape {np.shape(cur)} vs {value.shape}")
                continue
        node[leaf] = value.astype(np.asarray(cur).dtype)
    if strict and missed:
        raise KeyError(f"unmatched imports: {missed[:10]}")
    return new, missed


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .bin/.pth torch checkpoint into numpy (CPU)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in blob.items()}


def import_pretrained_bert(policy_params: Dict, bin_path: str,
                           strict: bool = False) -> Tuple[Dict, list]:
    """Load a pretrain pytorch_model.bin and graft its ``bert``
    submodule's weights into the policy encoder (the reference's
    ``encoder.bert = premodel.bert``, agent_dg.py:135-188).

    All four checkpoint families of r2rpretrain_class.py are accepted
    and auto-detected from key structure:
    - DicAdd/DicPM (DicModel, r2rpretrain_class.py:106-235)
    - Vic (VicModel, 61-104) — graft onto the Vic-aliased DicModel
    - HugAdd (vilmodel BertAddModel, 11-59) — onto legacy BertAddEncoder
    - BertAdd* (r2rmodel BertAddEncoder, 285-378) — whole encoder
      including top LSTM + decoder-init projections"""
    state = load_torch_state_dict(bin_path)
    bert_state = {k[len("bert."):]: v for k, v in state.items()
                  if k.startswith("bert.")}
    family = detect_pretrain_family(bert_state)
    if family == "dic":
        translated = translate_dic_model(bert_state)
        root = ("params", "encoder", "bert")
    elif family == "vic":
        translated = translate_vic_model(bert_state)
        root = ("params", "encoder", "bert")
    elif family == "hugadd":
        translated = translate_bert_add_model(bert_state)
        root = ("params", "encoder")
    else:  # bertadd_encoder: cfg.encoder_type in the BertAdd family
        translated = translate_bert_add_encoder(bert_state)
        root = ("params", "encoder")
    return apply_translated(policy_params, translated,
                            strict=strict, root=root)


def import_listener_checkpoint(policy_params: Dict, path: str,
                               strict: bool = False) -> Tuple[Dict, list]:
    """Load the reference listener checkpoint ({encoder, decoder, critic,
    adaIn} component dicts, agent_dg.py:1466-1510)."""
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    missed_all = []
    params = policy_params

    def np_state(name):
        sd = states[name]["state_dict"]
        return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in sd.items()}

    if "encoder" in states:
        tr = translate_dic_encoder(np_state("encoder"))
        params, missed = apply_translated(
            params, tr, root=("params", "encoder"))
        missed_all += missed
    if "decoder" in states:
        tr = translate_battn_decoder(np_state("decoder"))
        params, missed = apply_translated(
            params, tr, root=("params", "decoder"))
        missed_all += missed
    if "critic" in states:
        tr = translate_critic(np_state("critic"))
        params, missed = apply_translated(
            params, tr, root=("params", "critic"))
        missed_all += missed
    if "adaIn" in states:
        tr = {}
        st = np_state("adaIn")
        for name in ("a_fc", "b_fc"):
            if f"{name}.weight" in st:
                tr.update(translate_linear(st, name, name))
        params, missed = apply_translated(
            params, tr, root=("params", "adain"))
        missed_all += missed
    if strict and missed_all:
        raise KeyError(f"unmatched: {missed_all[:10]}")
    return params, missed_all
