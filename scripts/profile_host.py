#!/usr/bin/env python
"""cProfile of the host side of a bench iteration (device programs are
~ms; where do the remaining hundreds of ms go?)."""

import cProfile
import os
import pstats
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import expand_instructions, generate_synthetic_dataset
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.utils import Tokenizer, build_vocab

CONNECTIVITY = "/root/reference/connectivity"


def main():
    cfg = Config(
        encoder_type="Dic", include_vision=True, adain_type="channel",
        ab_type="a", a_type="sigmoid", use_shift=True,
        shift_kernel_size=5, depth_drop=True, consistent_drop=True,
        env_drop_stage="after_adain", angle_feat_size=128,
        feature_size=2048, d_enc_hidden_size=1024, d_hidden_size=1024,
        critic_dim=1024, d_vl_layers=3, d_la_layers=9, max_input=80,
        max_action=35, batch_size=20, featdropout=0.4, optim="rms",
        lr=1e-4, use_lr_scheduler=True, ml_weight=0.2,
        connectivity_dir=CONNECTIVITY, compute_dtype="bfloat16",
    )
    scans = ["17DRP5sb8fy", "2t7WUuJeko7"]
    data = generate_synthetic_dataset(scans, 40,
                                      connectivity_dir=CONNECTIVITY,
                                      min_hops=4, max_hops=6)
    vocab = build_vocab(data, min_count=1)
    tok = Tokenizer(vocab, encoding_length=cfg.max_input)
    items = expand_instructions(data, tok, max_input=cfg.max_input)
    feature_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=cfg.feature_size)
    depth_db = FeatureDB.synthetic(scans, CONNECTIVITY, dim=cfg.feature_size,
                                   salt=7)
    env = R2REnv(feature_db, items, batch_size=cfg.batch_size,
                 connectivity_dir=CONNECTIVITY,
                 max_candidates=cfg.max_candidates,
                 max_input=cfg.max_input, depth_db=depth_db)
    agent = Seq2SeqAgent(cfg, env, feature_db, depth_db=depth_db,
                         vocab_size=len(tok))

    def one_iter():
        agent.zero_grad()
        agent.accumulate_gradient("sample")
        agent.optim_step()

    t0 = time.time()
    agent.precompile_replay(cfg.batch_size)
    one_iter()
    one_iter()
    print(f"warm in {time.time()-t0:.1f}s", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    for _ in range(5):
        one_iter()
    prof.disable()
    print(f"5 iters in {time.time()-t0:.2f}s", flush=True)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(35)
    stats.sort_stats("tottime").print_stats(25)


if __name__ == "__main__":
    main()
