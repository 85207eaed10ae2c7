#!/usr/bin/env python
"""Fetch the Matterport3D navigation-graph connectivity files.

The connectivity graphs (90 scans, ~#MB of JSON) are published in the
Matterport3DSimulator repository under the MIT license; everything else
dasa_tpu needs at runtime (image/depth features, R2R splits) is covered
by docs/DATA_LIMITS.md.  This container has no network egress, so the
script is the documented recipe rather than something run in CI:

    python scripts/fetch_connectivity.py --out connectivity

Equivalent to:

    git clone --depth 1 https://github.com/peteanderson80/Matterport3DSimulator
    cp -r Matterport3DSimulator/connectivity <out>

dasa_tpu reads the directory via --connectivity_dir (config.py), which
defaults to the environment variable DASA_CONNECTIVITY_DIR when set.
"""

import argparse
import os
import sys
import urllib.request

BASE = ("https://raw.githubusercontent.com/peteanderson80/"
        "Matterport3DSimulator/master/connectivity/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="connectivity")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    scans_path = os.path.join(args.out, "scans.txt")
    try:
        urllib.request.urlretrieve(BASE + "scans.txt", scans_path)
    except OSError as e:
        print(f"download failed ({e}); this environment likely has no "
              "network egress — run the git clone recipe in the module "
              "docstring from a connected machine", file=sys.stderr)
        return 1
    with open(scans_path) as f:
        scans = [line.strip() for line in f if line.strip()]
    for i, scan in enumerate(scans):
        name = f"{scan}_connectivity.json"
        urllib.request.urlretrieve(BASE + name,
                                   os.path.join(args.out, name))
        print(f"[{i + 1}/{len(scans)}] {name}", flush=True)
    print(f"wrote {len(scans)} scan graphs to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
