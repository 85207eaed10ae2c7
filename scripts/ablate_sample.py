#!/usr/bin/env python
"""Attribute the fused sample-grad program's time by ablation: time the
dispatch under the headline config, then with one component removed at a
time.  Differences approximate each component's share (compile cost per
variant is paid once, outside the timed window)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import numpy as np

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import expand_instructions, generate_synthetic_dataset
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

CONNECTIVITY = "/root/reference/connectivity"

BASE = dict(
    encoder_type="Dic", include_vision=True, adain_type="channel",
    ab_type="a", a_type="sigmoid", use_shift=True, shift_kernel_size=5,
    depth_drop=True, consistent_drop=True, env_drop_stage="after_adain",
    angle_feat_size=128, feature_size=2048, d_enc_hidden_size=1024,
    d_hidden_size=1024, critic_dim=1024, d_vl_layers=3, d_la_layers=9,
    max_input=80, max_action=35, batch_size=20, featdropout=0.4,
    optim="rms", lr=1e-4, use_lr_scheduler=True, ml_weight=0.2,
    connectivity_dir=CONNECTIVITY, compute_dtype="bfloat16",
    remat="never",
)

VARIANTS = [
    ("full", {}),
    ("no_top_lstm", {"d_top_lstm": False}),
    ("vl_layers_1", {"d_vl_layers": 1}),
    ("no_adain", {"adain_type": "none"}),
    ("no_shift", {"use_shift": False}),
    ("max_action_16", {"max_action": 16}),
]


def main():
    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    data = generate_synthetic_dataset(scans, 40,
                                      connectivity_dir=CONNECTIVITY,
                                      min_hops=4, max_hops=6)
    vocab = build_vocab(data, min_count=1)
    feature_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=2048)
    depth_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=2048, salt=7)
    print(f"backend={jax.default_backend()}", flush=True)

    for name, kw in VARIANTS:
        cfg = Config(**{**BASE, **kw})
        tok = Tokenizer(vocab, encoding_length=cfg.max_input)
        items = expand_instructions(data, tok, max_input=cfg.max_input)
        env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                     connectivity_dir=CONNECTIVITY,
                     max_candidates=cfg.max_candidates,
                     max_input=cfg.max_input, depth_db=depth_db)
        agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                             vocab_size=len(tok))
        t0 = time.time()
        agent.zero_grad()
        agent.device_rollout(train_ml=None, train_rl=True,
                             feedback="sample")
        float(np.asarray(agent.losses[-1]))
        compile_s = time.time() - t0
        agent.zero_grad()
        t0 = time.time()
        n = 10
        for _ in range(n):
            agent.zero_grad()  # keep the non-accumulating program
            agent.device_rollout(train_ml=None, train_rl=True,
                                 feedback="sample")
        float(np.asarray(agent.losses[-1]))
        dt = (time.time() - t0) / n * 1e3
        steps = agent.env_steps_total() / n
        print(f"{name}: {dt:.1f} ms/dispatch ({steps:.0f} steps)"
              f"  [compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
