#!/usr/bin/env python
"""dasa_tpu CLI — mode dispatch mirroring the reference driver
(r2r_src/train.py:697-706):

    python train.py --train listener        # IL+RL training
    python train.py --train auglistener     # + aug env / back-translation
    python train.py --train validlistener [--submit]
    python train.py --train speaker
    python train.py --train validspeaker

Accepts the reference's flag spellings (--batchSize, --mlWeight_org, ...)
as well as snake_case.  Use --data_dir to point at R2R_{split}.json files;
without real data, scripts/make_task.py generates a synthetic task over
the real connectivity graphs.
"""

import sys

from dasa_tpu.config import parse_args
from dasa_tpu.train import trainer


def main(argv=None):
    cfg = parse_args(argv)
    print(cfg.to_json())
    if cfg.train in ("listener", "auglistener"):
        trainer.train(cfg)
    elif cfg.train == "validlistener":
        if cfg.beam:  # Dijkstra-search validation (train.py:530-579)
            trainer.beam_valid(cfg)
        else:
            trainer.valid(cfg)
    elif cfg.train == "speaker":
        trainer.train_speaker(cfg)
    elif cfg.train == "validspeaker":
        trainer.valid_speaker(cfg)
    elif cfg.train == "pretrain":
        from dasa_tpu.pretrain.trainer import run_pretrain

        run_pretrain(cfg)
    elif cfg.train == "beamvalid":
        trainer.beam_valid(cfg)
    elif cfg.train == "simpleagents":
        from dasa_tpu.agents.simple import eval_simple_agents

        world = trainer.World(cfg)
        for env_name in ("val_seen", "val_unseen"):
            out = eval_simple_agents(world.envs[env_name],
                                     world.evaluators[env_name],
                                     episode_len=cfg.max_action)
            for agent_name, summary in out.items():
                print("%s %s: %s" % (env_name, agent_name, ", ".join(
                    "%s: %.4f" % (m, v) for m, v in summary.items())),
                    flush=True)
    elif cfg.train in ("ndh", "ndhlistener"):
        world = trainer.World(cfg, ndh=True)
        trainer.train(cfg, world=world)
    elif cfg.train == "validndh":
        world = trainer.World(cfg, ndh=True)
        trainer.valid(cfg, world=world)
    else:
        sys.exit(f"unknown --train mode: {cfg.train}")


if __name__ == "__main__":
    main()
