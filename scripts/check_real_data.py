#!/usr/bin/env python
"""One-command real-data readiness check.

The moment real R2R assets are mounted, this runs the whole parity
pipeline — asset validation -> feature load -> (optional) reference
torch-checkpoint import -> validlistener -> SR/SPL — in one command:

    python scripts/check_real_data.py \
        --data_dir /data/r2r \
        --img_features /data/ResNet-152-imagenet.tsv \
        [--depth_features /data/ResNet-152-imagenet-depth.npy] \
        [--checkpoint /snap/DASA/state_dict/best_val_unseen] \
        [--pretrain_bert /data/checkpoint-12864/pytorch_model.bin] \
        [--flags "--adaIn_type channel --use_shift ..."]

Replaces the three manual steps documented in docs/DATA.md sections
1-4 (reference inference flow: r2r_src/train.py:396-421 validlistener).
Prints one SR/SPL line per split plus a final READY/FAILED verdict.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def fail(msg):
    print(f"FAILED: {msg}", flush=True)
    sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True,
                    help="directory with R2R_{split}.json")
    ap.add_argument("--img_features", required=True,
                    help="ResNet-152-imagenet.tsv or .npz feature store")
    ap.add_argument("--depth_features", default=None,
                    help=".npy depth values (with <name>-index.npy or "
                         "viewpointIds.npy next to it) or .npz store")
    ap.add_argument("--checkpoint", default=None,
                    help="listener checkpoint: native msgpack or the "
                         "reference's per-component torch dict")
    ap.add_argument("--pretrain_bert", default=None,
                    help="reference pytorch_model.bin to graft into the "
                         "encoder (DicAddActionPreTrain format)")
    ap.add_argument("--splits", default="val_seen,val_unseen")
    ap.add_argument("--vocab", default=None,
                    help="prebuilt vocab file; falls back to the "
                         "reference's committed train_vocab.txt when "
                         "R2R_train.json is absent (eval-only check)")
    ap.add_argument("--flags", default="",
                    help="extra train.py-style flags for the model "
                         "config (reference spellings accepted)")
    args = ap.parse_args()

    # ---- 1. validate assets ------------------------------------------
    for split in args.splits.split(","):
        p = os.path.join(args.data_dir, f"R2R_{split}.json")
        if not os.path.exists(p):
            fail(f"missing split file {p}")
    if not os.path.exists(args.img_features):
        fail(f"missing image features {args.img_features}")
    have_train = os.path.exists(
        os.path.join(args.data_dir, "R2R_train.json"))
    vocab = args.vocab
    if vocab is None and not have_train:
        # the committed real vocab is enough for eval-only runs
        # (tests/test_real_artifacts.py proves it loads + encodes)
        committed = "/root/reference/tasks/R2R/data/train_vocab.txt"
        if os.path.exists(committed):
            vocab = committed
            print(f"no R2R_train.json: using committed vocab {vocab}",
                  flush=True)
        else:
            fail("R2R_train.json absent and no --vocab given")
    if vocab is not None and not os.path.exists(vocab):
        fail(f"missing vocab file {vocab}")
    print("assets: ok", flush=True)

    # ---- 2. config (headline DASA dims + user flags) -----------------
    from dasa_tpu.config import parse_args as parse_cfg

    flag_list = args.flags.split() if args.flags else []
    cfg = parse_cfg([
        "--train", "validlistener",
        "--data_dir", args.data_dir,
        "--img_features_path", args.img_features,
        *(["--depth_features_path", args.depth_features]
          if args.depth_features else []),
        *(["--vocab_path", vocab] if vocab else []),
        "--name", "readiness_check",
        *flag_list,
    ])

    # ---- 3. build world + agent, import checkpoints ------------------
    from dasa_tpu.train import trainer

    val_splits = tuple(args.splits.split(","))
    world = trainer.World(cfg, splits=("train",) if have_train else (),
                          val_splits=val_splits)
    agent = trainer.make_agent(
        cfg, world, env_name="train" if have_train else val_splits[0])
    if args.pretrain_bert:
        from dasa_tpu.utils.torch_import import import_pretrained_bert

        agent.params = import_pretrained_bert(agent.params,
                                              args.pretrain_bert)
        print(f"grafted pretrained BERT from {args.pretrain_bert}",
              flush=True)
    if args.checkpoint:
        try:
            it = agent.load(args.checkpoint)
            print(f"loaded native checkpoint (iter {it})", flush=True)
        except Exception:
            from dasa_tpu.utils.torch_import import (
                import_listener_checkpoint,
            )

            agent.params = import_listener_checkpoint(agent.params,
                                                      args.checkpoint)
            print(f"imported torch checkpoint {args.checkpoint}",
                  flush=True)

    # ---- 4. validlistener + score ------------------------------------
    results = {}
    for env_name, env in world.envs.items():
        if env_name not in args.splits.split(","):
            continue
        agent.env = env
        out = agent.test(feedback="argmax")
        summary, _ = world.evaluators[env_name].score(out)
        results[env_name] = summary
        print("%s: %s" % (env_name, ", ".join(
            "%s %.4f" % (m, v) for m, v in sorted(summary.items()))),
            flush=True)
    if not results:
        fail("no splits evaluated")
    print("READY: real-data pipeline ran end-to-end "
          f"({', '.join(f'{k} SR {v.get('success_rate', 0):.3f}' for k, v in results.items())})",
          flush=True)


if __name__ == "__main__":
    main()
