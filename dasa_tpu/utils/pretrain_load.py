"""Initialize the listener encoder from a pretraining checkpoint.

The reference's headline run constructs its encoder FROM the PREVALENT
checkpoint at agent init (`DicAddActionPreTrain.from_pretrained(
args.pretrain_model_name)` -> `encoder.bert = premodel.bert`,
r2r_src/agent_dg.py:135-188; the README passes
`--pretrain_model_name ./pretrained_hug_models/dicadd/checkpoint-12864`,
README.md:94).  This module resolves the two on-disk formats a dasa_tpu
user can have and grafts the encoder weights into the policy params:

1. an HF `save_pretrained` directory (or a bare pytorch_model.bin) with
   torch weights — any of the four r2rpretrain_class.py families,
   translated by utils/torch_import (parity-tested there);
2. our own Pretrainer's checkpoints (pretrain/trainer.py:205-217):
   pickled ``{"step", "params": flax msgpack bytes}`` files named
   ``checkpoint-N``; a directory resolves to its highest-N checkpoint.

Tolerance mirrors the reference's key-mismatch policy (agent_dg.py
load notice at 1495-1505): unmatched/mis-shaped leaves are reported and
skipped, except that grafting NOTHING is an error — a silently inert
--pretrain_model_name is worse than a crash.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, Tuple

import numpy as np

from dasa_tpu.utils.torch_import import (
    apply_translated,
    import_pretrained_bert,
)


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def resolve_pretrain_checkpoint(path: str) -> Tuple[str, str]:
    """Map a --pretrain_model_name value to (kind, file) where kind is
    "torch" (HF dir / .bin) or "flax" (our Pretrainer pickle)."""
    if os.path.isdir(path):
        hf_bin = os.path.join(path, "pytorch_model.bin")
        if os.path.exists(hf_bin):
            return "torch", hf_bin
        # a Pretrainer snap dir: pick the latest checkpoint-N file
        cands = []
        for name in os.listdir(path):
            m = re.fullmatch(r"checkpoint-(\d+)", name)
            if m and os.path.isfile(os.path.join(path, name)):
                cands.append((int(m.group(1)), name))
        if cands:
            return "flax", os.path.join(path, max(cands)[1])
        raise FileNotFoundError(
            f"pretrain_model_name dir {path!r} has neither a "
            "pytorch_model.bin nor checkpoint-N files")
    if not os.path.exists(path):
        raise FileNotFoundError(f"pretrain_model_name {path!r} not found")
    # file: sniff our pickle format first; torch .bin files are either
    # zip archives or pickles with torch persistent ids — both fail the
    # plain pickle.load / key check below
    try:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        if isinstance(blob, dict) and isinstance(blob.get("params"),
                                                 (bytes, bytearray)):
            return "flax", path
    except Exception:
        pass
    return "torch", path


def load_flax_pretrain_bert(path: str) -> Dict[Tuple[str, ...], np.ndarray]:
    """Read a Pretrainer checkpoint and return its DicModel (``bert``)
    subtree as flat path->array leaves (the export_bert_params view,
    pretrain/trainer.py:221-225, without needing the live Pretrainer)."""
    from flax import serialization

    with open(path, "rb") as f:
        blob = pickle.load(f)
    tree = serialization.msgpack_restore(blob["params"])
    params = tree.get("params", tree)
    if "bert" not in params:
        raise KeyError(
            f"{path!r} is not a Pretrainer checkpoint: no 'bert' subtree "
            f"(top-level keys: {sorted(params)[:8]})")
    return _flatten(params["bert"])


def load_pretrained_encoder(policy_params: Dict, path: str,
                            strict: bool = False) -> Tuple[Dict, list]:
    """Graft a pretrain checkpoint's encoder weights into the policy
    param tree (the reference's ``encoder.bert = premodel.bert``).

    Returns (new_params, missed).  Raises if nothing grafts at all —
    e.g. a Dic-family checkpoint against a non-BERT encoder."""
    kind, file = resolve_pretrain_checkpoint(path)
    if kind == "torch":
        new, missed = import_pretrained_bert(policy_params, file,
                                             strict=strict)
        n_applied = None  # import_pretrained_bert reports misses only
    else:
        translated = load_flax_pretrain_bert(file)
        new, missed = apply_translated(
            policy_params, translated, strict=strict,
            root=("params", "encoder", "bert"),
            row_slice_embeddings=True)
        n_applied = len(translated) - len(missed)
        if n_applied == 0:
            raise ValueError(
                f"pretrain checkpoint {file!r} grafted ZERO leaves onto "
                "the encoder — encoder_type mismatch? first misses: "
                f"{missed[:5]}")
    if n_applied is None:
        # torch path: applied-count not returned; require that the
        # encoder subtree actually changed
        def leaves(t):
            return _flatten(t.get("params", t).get("encoder", {}))

        before, after = leaves(policy_params), leaves(new)
        if all(np.array_equal(before[k], after[k]) for k in before):
            raise ValueError(
                f"pretrain checkpoint {file!r} grafted ZERO leaves onto "
                f"the encoder — encoder_type mismatch? first misses: "
                f"{missed[:5]}")
    return new, missed
