"""Training / validation drivers and world setup.

Mirrors the reference CLI surface (r2r_src/train.py): `listener`,
`auglistener` (org/aug alternation with ml_weight_org/aug and optional
speaker back-translation), `validlistener` (+--submit JSON dump),
`speaker`, `validspeaker`.  Best-checkpoint policy tracks best SR per val
env, best val_unseen SPL, and best SR-sum (train.py:306-365).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from dasa_tpu.agents import Seq2SeqAgent
from dasa_tpu.config import Config
from dasa_tpu.data.datasets import expand_instructions, load_datasets
from dasa_tpu.data.features import load_feature_db
from dasa_tpu.env import R2REnv
from dasa_tpu.train.evaluation import Evaluation
from dasa_tpu.train.metrics import MetricsWriter
from dasa_tpu.utils import Tokenizer, build_vocab, read_vocab, write_vocab
from dasa_tpu.utils.misc import set_seed


class World:
    """Shared data context: tokenizer, feature stores, envs, evaluators.

    `ndh=True` reads CVDN-format NDH_{split}.json dialogs and converts
    them to the R2R schema via dasa_tpu.data.ndh (path_type/history from
    the config) — the whole listener stack then runs unchanged
    (reference: ndhtrain.py)."""

    def __init__(self, cfg: Config, splits=("train",),
                 val_splits=("val_seen", "val_unseen"), ndh: bool = False):
        self.cfg = cfg
        self.ndh = ndh
        set_seed(cfg.seed)
        vocab_path = cfg.vocab_path or os.path.join(
            cfg.data_dir, "train_vocab.txt")
        if os.path.exists(vocab_path):
            # a prebuilt vocab (e.g. the reference's committed
            # tasks/R2R/data/train_vocab.txt) removes the need for the
            # train split entirely — eval-only worlds can run from the
            # val splits alone (scripts/check_real_data.py)
            vocab = read_vocab(vocab_path)
        else:
            train_raw = self._load("train")
            vocab = build_vocab(train_raw, min_count=5)
            if len(vocab) < 20:  # tiny synthetic data: keep every word
                vocab = build_vocab(train_raw, min_count=1)
            write_vocab(vocab, vocab_path)
        self.tok = Tokenizer(vocab, encoding_length=cfg.max_input)

        scans = sorted({d["scan"] for split in set(
            list(splits) + list(val_splits) + (["aug"] if cfg.aug else []))
            for d in (load_datasets([cfg.aug], cfg.data_dir)
                      if split == "aug" else self._load(split))})
        self.feature_db = load_feature_db(
            cfg.img_features_path, scans, cfg.connectivity_dir,
            dim=cfg.feature_size)
        self.depth_db = None
        if cfg.adain_type != "none" or cfg.depth_features_path:
            self.depth_db = load_feature_db(
                cfg.depth_features_path, scans, cfg.connectivity_dir,
                dim=cfg.feature_size, salt=0x9E3779B9)

        self.envs: Dict[str, R2REnv] = {}
        self.evaluators: Dict[str, Evaluation] = {}
        for split in list(splits) + list(val_splits):
            self._add_env(split)
        if cfg.aug:
            raw = load_datasets([cfg.aug], cfg.data_dir)
            items = expand_instructions(raw, self.tok, cfg.max_input)
            self.envs["aug"] = self._make_env(items, "aug")

    def _load(self, split):
        if not self.ndh:
            return load_datasets([split], self.cfg.data_dir)
        import json as _json
        import os as _os

        from dasa_tpu.data.ndh import convert_ndh_items

        path = _os.path.join(self.cfg.data_dir, f"NDH_{split}.json")
        with open(path) as f:
            raw = _json.load(f)
        return convert_ndh_items(raw, self.cfg.path_type,
                                 self.cfg.history)

    def _make_env(self, items, name):
        cfg = self.cfg
        return R2REnv(self.feature_db, items, batch_size=cfg.batch_size,
                      seed=cfg.seed, name=name,
                      connectivity_dir=cfg.connectivity_dir,
                      max_candidates=cfg.max_candidates,
                      max_input=cfg.max_input, depth_db=self.depth_db)

    def _add_env(self, split):
        raw = self._load(split)
        items = expand_instructions(raw, self.tok, self.cfg.max_input)
        self.envs[split] = self._make_env(items, split)
        self.evaluators[split] = Evaluation(
            raw, self.cfg.connectivity_dir, splits=[split])


def make_mesh_if_requested(cfg: Config):
    """--data_parallel: initialize the multi-host runtime (no-op on one
    host) and build the ('data','model') device mesh."""
    if not cfg.data_parallel:
        return None
    import jax

    from dasa_tpu.parallel import make_mesh
    from dasa_tpu.parallel.distributed import initialize

    initialize()
    mesh = make_mesh(n_data=cfg.n_data)
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data != 0:
        print(f"WARNING: batch_size {cfg.batch_size} not divisible by "
              f"data axis {n_data}; batch-dim arrays will be replicated "
              "instead of sharded", flush=True)
    print(f"data-parallel mesh: {n_data} devices on 'data' "
          f"({jax.process_count()} process(es))", flush=True)
    return mesh


def make_agent(cfg: Config, world: World, env_name: str = "train"
               ) -> Seq2SeqAgent:
    return Seq2SeqAgent(cfg, world.envs[env_name], world.feature_db,
                        depth_db=world.depth_db,
                        vocab_size=len(world.tok),
                        mesh=make_mesh_if_requested(cfg))


def run_validation(agent: Seq2SeqAgent, world: World, writer, it: int,
                   best: dict, snap_dir: str,
                   val_splits=("val_seen", "val_unseen")) -> str:
    loss_str = ""
    current_sr_sum = 0.0
    csv_row = {"iteration": it}
    for env_name in val_splits:
        agent.env = world.envs[env_name]
        results = agent.test(feedback="argmax")
        summary, _ = world.evaluators[env_name].score(results)
        loss_str += ", %s " % env_name
        for metric, val in summary.items():
            loss_str += ", %s: %.3f" % (metric, val)
            csv_row[f"{env_name} {metric}"] = round(float(val), 6)
            if writer:
                writer.add_scalar(f"metric/{env_name}_{metric}", val, it)
        sr = summary["success_rate"]
        current_sr_sum += sr
        if sr > best.setdefault(env_name, 0.0):
            best[env_name] = sr
            agent.save(it, os.path.join(snap_dir, f"best_{env_name}"))
        if env_name == "val_unseen" and \
                summary["spl"] > best.setdefault("spl_unseen", 0.0):
            best["spl_unseen"] = summary["spl"]
            agent.save(it, os.path.join(snap_dir, "best_spl_unseen"))
    if current_sr_sum > best.setdefault("sr_sum", 0.0):
        best["sr_sum"] = current_sr_sum
        agent.save(it, os.path.join(snap_dir, "best_sr_sum"))
    if writer:
        writer.write_csv_row(csv_row)
    return loss_str


def train(cfg: Config, world: Optional[World] = None,
          speaker=None) -> Seq2SeqAgent:
    """listener / auglistener training (train.py:157-393)."""
    world = world or World(cfg)
    agent = make_agent(cfg, world)
    train_env = world.envs["train"]
    aug_env = world.envs.get("aug")
    snap_dir = os.path.join(cfg.snap_dir, cfg.name, "state_dict")
    os.makedirs(snap_dir, exist_ok=True)
    writer = MetricsWriter(os.path.join(cfg.log_dir, cfg.name))

    if cfg.self_train and speaker is None:
        from dasa_tpu.agents.speaker import SpeakerAgent

        speaker = SpeakerAgent(cfg, train_env, world.feature_db,
                               vocab_size=len(world.tok), tok=world.tok)
        if cfg.speaker is not None:
            speaker.load(cfg.speaker)

    start_iter = 0
    if cfg.load is not None:
        start_iter = agent.load(cfg.load)
        print(f"Loaded listener from {cfg.load} at iter {start_iter}")

    best: dict = {}
    feedback = cfg.feedback
    log_every = 40 if cfg.fast_train else cfg.log_every
    start = time.time()
    from dasa_tpu.utils.misc import GracefulKiller, Timer

    killer = GracefulKiller()
    timer = Timer()

    for idx in range(start_iter, start_iter + cfg.iters, log_every):
        agent.logs = defaultdict(list)
        interval = min(log_every, start_iter + cfg.iters - idx)
        it = idx + interval

        timer.tic("train")
        if aug_env is None:
            agent.env = train_env
            agent.train(interval, feedback=feedback)
        else:
            for _ in range(interval // 2):
                agent.zero_grad()
                agent.env = train_env
                agent.accumulate_gradient(feedback,
                                          ml_weight=cfg.ml_weight_org)
                agent.env = aug_env
                agent.accumulate_gradient(feedback,
                                          ml_weight=cfg.ml_weight_aug,
                                          speaker=speaker)
                agent.optim_step()
        timer.toc("train")
        timer.step()

        total = max(sum(agent.logs.get("total", [])), 1)
        for tag in ("loss", "ml_loss", "forth_loss", "rl_loss",
                    "pm_loss", "kl_loss"):
            vals = agent.logs.get(tag, [])
            if vals:
                writer.add_scalar(f"loss/{tag}", float(np.mean(vals)), it)
        if agent.logs.get("critic_loss"):
            writer.add_scalar("loss/critic",
                              sum(agent.logs["critic_loss"]) / total, it)
        if agent.logs.get("entropy"):
            writer.add_scalar("policy/entropy",
                              sum(agent.logs["entropy"]) / total, it)

        if it % cfg.val_every == 0:
            loss_str = run_validation(agent, world, writer, it, best,
                                      snap_dir)
            elapsed = time.time() - start
            print("PROGRESS: %d/%d (%.0fs)%s" % (
                it, start_iter + cfg.iters, elapsed, loss_str), flush=True)
        if it % cfg.save_every == 0:
            agent.save(it, os.path.join(snap_dir, f"LAST_iter{it}"))
        writer.flush()
        if killer.kill_now:  # SIGINT/SIGTERM: checkpoint and exit clean
            agent.save(it, os.path.join(snap_dir, f"LAST_iter{it}"))
            print(f"PROGRESS: interrupted at {it}, checkpoint saved",
                  flush=True)
            break

    agent.save(start_iter + cfg.iters,
               os.path.join(snap_dir, f"LAST_iter{start_iter + cfg.iters}"))
    return agent


def beam_valid(cfg: Config, world: Optional[World] = None
               ) -> Dict[str, dict]:
    """Search-based validation with speaker/listener score mixing and
    optional alpha param search (train.py:424-517).  cfg.search_type
    picks the expansion strategy: "dijkstra" (agent_dg.py:1038-1325) or
    the speaker-follower's "state_factored" search
    (tasks/R2R/speaker/follower.py:987-999)."""
    from dasa_tpu.agents.search import (
        beam_search_test,
        cal_score,
        state_factored_search_test,
    )
    from dasa_tpu.agents.speaker import SpeakerAgent

    world = world or World(cfg)
    agent = make_agent(cfg, world)
    speaker = SpeakerAgent(cfg, world.envs["train"], world.feature_db,
                           vocab_size=len(world.tok), tok=world.tok)
    if cfg.speaker is not None:
        speaker.load(cfg.speaker)
    if cfg.load is not None:
        print("Loaded listener at iter %d" % agent.load(cfg.load))

    out = {}
    for env_name, env in world.envs.items():
        if env_name in ("train", "aug"):
            continue
        agent.env = env
        speaker.env = env
        if cfg.search_type == "state_factored":
            results = state_factored_search_test(
                agent, speaker, cfg.candidates, cfg.successor_size,
                max_expansions=cfg.max_expansions or 80)
        else:
            results = beam_search_test(agent, speaker, cfg.candidates)
        evaluator = world.evaluators[env_name]

        def pick(alpha, avg_speaker, avg_listener):
            picked = []
            for key, res in results.items():
                best = max(res["paths"],
                           key=lambda p: cal_score(p, alpha, avg_speaker,
                                                   avg_listener))
                picked.append({
                    "instr_id": key,
                    "trajectory": [(vp, 0, 0) for vp in res["dijk_path"]]
                    + best["trajectory"],
                })
            return picked

        if cfg.param_search:
            logs = []
            for avg_speaker in (False, True):
                for avg_listener in (False, True):
                    for alpha in np.arange(0.0, 1.0001, 0.05):
                        summary, _ = evaluator.score(
                            pick(alpha, avg_speaker, avg_listener),
                            allow_partial=True)
                        logs.append((avg_speaker, avg_listener,
                                     float(alpha),
                                     summary["success_rate"]))
            best = max(logs, key=lambda x: x[3])
            print(f"{env_name}: best avg_speaker={best[0]} "
                  f"avg_listener={best[1]} alpha={best[2]:.2f} "
                  f"SR={best[3]:.4f}", flush=True)
            out[env_name] = {"best": best, "logs": logs}
        else:
            picked = pick(cfg.alpha, True, True)
            summary, _ = evaluator.score(picked, allow_partial=True)
            print("Env name: %s, %s" % (env_name, ", ".join(
                "%s: %.4f" % (m, v) for m, v in summary.items())),
                flush=True)
            out[env_name] = summary
            if cfg.submit:
                os.makedirs(os.path.join(cfg.log_dir, cfg.name),
                            exist_ok=True)
                with open(os.path.join(cfg.log_dir, cfg.name,
                                       f"submit_{env_name}.json"),
                          "w") as f:
                    json.dump(picked, f, sort_keys=True, indent=2)
    return out


def train_speaker(cfg: Config, world: Optional[World] = None):
    """Speaker training with best-BLEU/loss checkpoints
    (train.py:110-155)."""
    from dasa_tpu.agents.speaker import SpeakerAgent

    world = world or World(cfg)
    speaker = SpeakerAgent(cfg, world.envs["train"], world.feature_db,
                           vocab_size=len(world.tok), tok=world.tok)
    snap_dir = os.path.join(cfg.snap_dir, cfg.name, "state_dict")
    os.makedirs(snap_dir, exist_ok=True)
    writer = MetricsWriter(os.path.join(cfg.log_dir, cfg.name))
    best_bleu = defaultdict(lambda: 0.0)
    best_loss = defaultdict(lambda: 1e9)
    log_every = 40 if cfg.fast_train else cfg.log_every
    for idx in range(0, cfg.iters, log_every):
        interval = min(log_every, cfg.iters - idx)
        it = idx + interval
        speaker.env = world.envs["train"]
        losses = speaker.train(interval)
        writer.add_scalar("speaker/train_loss", float(np.mean(losses)), it)
        if it % cfg.val_every == 0:
            for env_name in ("val_seen", "val_unseen"):
                if env_name not in world.envs:
                    continue
                speaker.env = world.envs[env_name]
                path2inst, loss, word_accu, sent_accu = speaker.valid()
                bleu, _ = world.evaluators[env_name].bleu_score(
                    path2inst, world.tok)
                writer.add_scalar(f"speaker/{env_name}_bleu", bleu, it)
                writer.add_scalar(f"speaker/{env_name}_loss", loss, it)
                if bleu > best_bleu[env_name]:
                    best_bleu[env_name] = bleu
                    speaker.save(it, os.path.join(
                        snap_dir, f"best_{env_name}_bleu"))
                if loss < best_loss[env_name]:
                    best_loss[env_name] = loss
                    speaker.save(it, os.path.join(
                        snap_dir, f"best_{env_name}_loss"))
                print(f"SPEAKER iter {it} {env_name}: bleu {bleu:.4f} "
                      f"loss {loss:.4f} word_accu {word_accu:.4f}",
                      flush=True)
            writer.flush()
    speaker.save(cfg.iters, os.path.join(snap_dir, f"LAST_iter{cfg.iters}"))
    return speaker


def valid_speaker(cfg: Config, world: Optional[World] = None):
    from dasa_tpu.agents.speaker import SpeakerAgent

    world = world or World(cfg)
    speaker = SpeakerAgent(cfg, world.envs["train"], world.feature_db,
                           vocab_size=len(world.tok), tok=world.tok)
    if cfg.load:
        speaker.load(cfg.load)
    out = {}
    for env_name in ("val_seen", "val_unseen"):
        if env_name not in world.envs:
            continue
        speaker.env = world.envs[env_name]
        path2inst, loss, word_accu, sent_accu = speaker.valid()
        bleu, precisions = world.evaluators[env_name].bleu_score(
            path2inst, world.tok)
        out[env_name] = {"bleu": bleu, "loss": loss,
                         "word_accu": word_accu, "sent_accu": sent_accu}
        print(f"{env_name}: bleu {bleu:.4f} loss {loss:.4f}", flush=True)
    return out


def valid(cfg: Config, world: Optional[World] = None) -> Dict[str, dict]:
    """validlistener (train.py:396-421)."""
    world = world or World(cfg)
    agent = make_agent(cfg, world)
    if cfg.load is not None:
        it = agent.load(cfg.load)
        print(f"Loaded listener at iter {it} from {cfg.load}")
    out = {}
    os.makedirs(os.path.join(cfg.log_dir, cfg.name), exist_ok=True)
    for env_name, env in world.envs.items():
        if env_name == "aug" or env_name == "train":
            continue
        agent.env = env
        results = agent.test(feedback="argmax")
        if env_name == "test":
            # the test split has no ground-truth goals: submission only
            # (reference train.py:417-421 / beam_valid test handling)
            summary = {}
        else:
            summary, _ = world.evaluators[env_name].score(results)
            print("Env name: %s, %s" % (env_name, ", ".join(
                "%s: %.4f" % (m, v) for m, v in summary.items())),
                flush=True)
        out[env_name] = summary
        if cfg.submit:
            path = os.path.join(cfg.log_dir, cfg.name,
                                f"submit_{env_name}.json")
            with open(path, "w") as f:
                json.dump(results, f, sort_keys=True, indent=2)
    return out
