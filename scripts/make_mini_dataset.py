#!/usr/bin/env python
"""Carve a mini dataset from real R2R data + feature stores.

Equivalent of the reference's preprocess_mini_dataset.py: filters each
split to the items of a single scan (capped at --max_items) and subsets
the image/depth feature stores to that scan, so the full train/val loop
runs in minutes (consumed via --data_dir/--img_features_path).

    python scripts/make_mini_dataset.py --data_dir data/task \
        --features data/img_features.npz --out data/mini
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from dasa_tpu.data.datasets import load_datasets  # noqa: E402
from dasa_tpu.data.features import FeatureDB  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--features", default=None)
    p.add_argument("--dfeatures", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--max_items", type=int, default=100)
    p.add_argument("--splits", nargs="+",
                   default=["train", "val_seen", "val_unseen"])
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    scans = set()
    for split in args.splits:
        data = load_datasets([split], args.data_dir)
        scan = data[0]["scan"]
        mini = [d for d in data if d["scan"] == scan][: args.max_items]
        scans.add(scan)
        with open(os.path.join(args.out, f"R2R_{split}.json"), "w") as f:
            json.dump(mini, f)
        print(f"{split}: {len(mini)} items from scan {scan}")

    for name, path in (("img_features", args.features),
                       ("depth_features", args.dfeatures)):
        if path is None:
            continue
        db = FeatureDB.from_npz(path) if path.endswith(".npz") else \
            FeatureDB.from_tsv(path)
        keep = [i for i, lid in enumerate(db.ids)
                if lid.split("_")[0] in scans]
        sub = FeatureDB([db.ids[i] for i in keep], db.values[keep])
        sub.save(os.path.join(args.out, f"{name}.npz"))
        print(f"{name}: {len(keep)} viewpoints")


if __name__ == "__main__":
    main()
