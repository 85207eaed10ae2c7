"""Speaker agent: training, validation, inference, back-translation.

Reference: r2r_src/speaker.py:10-388.  Trajectory features are collected
on host as *index* records (teacher-driving the graph env), gathered on
device from the resident tables, and both teacher-forcing and the full
greedy/sampling decode run as single jitted programs (`lax.scan` over
words) instead of a Python word loop.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import serialization

from dasa_tpu.config import Config
from dasa_tpu.data.features import FeatureDB
from dasa_tpu.env import R2REnv
from dasa_tpu.models.featurize import (
    angle_feature,
    assemble_pano,
)
from dasa_tpu.models.layers import NEG_INF
from dasa_tpu.models.speaker import SpeakerDecoder, SpeakerEncoder
from dasa_tpu.train.optim import CLIP_NORM, scale_by_torch_rms
from dasa_tpu.utils.angles import all_point_angle_feature
from dasa_tpu.utils.vocab import PAD_IDX, Tokenizer


class SpeakerModel(nn.Module):
    cfg: Config
    vocab_size: int
    dtype: object = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.encoder = SpeakerEncoder(
            cfg.feature_all_size, cfg.rnn_dim, cfg.dropout,
            cfg.featdropout, cfg.angle_feat_size,
            bidirectional=cfg.bidir, dtype=self.dtype)
        self.decoder = SpeakerDecoder(
            self.vocab_size, cfg.wemb, cfg.rnn_dim, cfg.dropout,
            dtype=self.dtype)

    def encode(self, can_feats, img_feats, *, already_dropfeat=False,
               deterministic=True):
        return self.encoder(can_feats, img_feats,
                            already_dropfeat=already_dropfeat,
                            deterministic=deterministic)

    def decode(self, words, ctx, ctx_mask, h0, c0, *, deterministic=True):
        return self.decoder(words, ctx, ctx_mask, h0, c0,
                            deterministic=deterministic)

    def decode_step(self, word, ctx, ctx_mask, h, c, *,
                    deterministic=True):
        return self.decoder.step(word, ctx, ctx_mask, h, c,
                                 deterministic=deterministic)

    def __call__(self, can_feats, img_feats, words):
        ctx = self.encode(can_feats, img_feats)
        b = can_feats.shape[0]
        h0 = jnp.zeros((b, self.cfg.rnn_dim), self.dtype)
        ctx_mask = jnp.zeros(ctx.shape[:2], bool)
        return self.decode(words, ctx, ctx_mask, h0, h0)


class SpeakerAgent:
    def __init__(self, cfg: Config, env: Optional[R2REnv],
                 feature_db: FeatureDB, vocab_size: int,
                 tok: Tokenizer, rng_seed: int = 0):
        self.cfg = cfg
        self.env = env
        self.tok = tok
        dtype = jnp.float32 if jax.default_backend() == "cpu" else {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            cfg.compute_dtype]
        self.dtype = dtype
        self.model = SpeakerModel(cfg, vocab_size, dtype)
        self.feat_table = jnp.asarray(feature_db.values, dtype)
        self.angle_table = jnp.asarray(
            all_point_angle_feature(cfg.angle_feat_size), dtype)
        self._init_params(rng_seed)
        self.tx = self._build_tx()
        self.opt_state = self.tx.init(self.params["params"])
        self._rng = jax.random.PRNGKey(cfg.seed + 17 + rng_seed)
        self._counter = 0
        self._jit: Dict = {}

    def _init_params(self, rng_seed):
        cfg = self.cfg
        b, t, lw = 2, 3, 4
        F = cfg.feature_all_size
        self.params = self.model.init(
            jax.random.PRNGKey(rng_seed + 31),
            jnp.zeros((b, t, F), self.dtype),
            jnp.zeros((b, t, cfg.views, F), self.dtype),
            jnp.zeros((b, lw), jnp.int32))

    def _build_tx(self):
        cfg = self.cfg
        if cfg.optim == "rms":
            inner = scale_by_torch_rms()
        elif cfg.optim in ("adam", "adamw"):
            inner = optax.scale_by_adam()
        else:
            inner = optax.identity()
        return optax.chain(optax.clip_by_global_norm(CLIP_NORM), inner,
                           optax.scale_by_learning_rate(cfg.lr))

    # ------------------------------------------------------------------
    # trajectory collection (host) — from_shortest_path
    # (speaker.py:164-199) with index records instead of feature blocks
    # ------------------------------------------------------------------
    def collect_teacher_path(self, max_steps: Optional[int] = None
                             ) -> Tuple[dict, np.ndarray]:
        env = self.env
        obs = env._get_obs()
        b = obs.batch_size()
        max_steps = max_steps or self.cfg.max_action
        ended = np.zeros(b, bool)
        lengths = np.zeros(b, np.int64)
        rec = {k: [] for k in ("feat_row", "view_index", "cand_point_id",
                               "cand_heading", "cand_elevation",
                               "has_cand")}
        for _ in range(max_steps):
            if ended.all():
                break
            teacher = np.where(obs.teacher >= obs.cand_n, -1,
                               obs.teacher).astype(np.int64)
            teacher = np.where(ended, -1, teacher)
            rows = np.arange(b)
            rec["feat_row"].append(obs.feat_row.copy())
            rec["view_index"].append(obs.view_index.copy())
            safe_t = np.maximum(teacher, 0)
            rec["cand_point_id"].append(
                obs.cand_point_id[rows, safe_t].copy())
            rec["cand_heading"].append(
                obs.cand_heading[rows, safe_t].copy())
            rec["cand_elevation"].append(
                obs.cand_elevation[rows, safe_t].copy())
            rec["has_cand"].append((teacher >= 0).copy())
            lengths += (~ended).astype(np.int64)
            obs = env.step(teacher)
            ended |= teacher == -1
        stacked = {k: np.stack(v, axis=1) for k, v in rec.items()}  # (B,T,..)
        # bucket T to multiples of 4 so jitted programs don't recompile
        # per trajectory length
        t = stacked["feat_row"].shape[1]
        t_pad = min(max_steps, -(-t // 4) * 4)
        if t_pad > t:
            reps = t_pad - t
            for k, v in stacked.items():
                tail = np.repeat(v[:, -1:], reps, axis=1)
                if k == "has_cand":
                    tail = np.zeros_like(tail)
                stacked[k] = np.concatenate([v, tail], axis=1)
        return stacked, lengths

    def _gather_traj_feats(self, rec):
        """(B,T) index records -> img_feats (B,T,36,F), can_feats (B,T,F)."""
        cfg = self.cfg
        feat_row = jnp.asarray(rec["feat_row"])
        view_index = jnp.asarray(rec["view_index"])
        b, t = feat_row.shape
        img = assemble_pano(self.feat_table, self.angle_table,
                            feat_row.reshape(-1), view_index.reshape(-1))
        img = img.reshape(b, t, cfg.views, -1)
        pano = self.feat_table[feat_row.reshape(-1)]  # (B*T, 36, D)
        point = jnp.asarray(rec["cand_point_id"]).reshape(-1)
        vis = pano[jnp.arange(b * t), point]          # (B*T, D)
        ang = angle_feature(jnp.asarray(rec["cand_heading"]).reshape(-1),
                            jnp.asarray(rec["cand_elevation"]).reshape(-1),
                            cfg.angle_feat_size).astype(vis.dtype)
        can = jnp.concatenate([vis, ang], axis=-1)
        has = jnp.asarray(rec["has_cand"]).reshape(-1, 1)
        can = jnp.where(has, can, 0.0).reshape(b, t, -1)
        return img, can

    # ------------------------------------------------------------------
    def _tf_grad_fn(self, t_steps: int, lw: int, train: bool):
        key = ("tf", t_steps, lw, train)
        if key not in self._jit:
            model = self.model

            def loss_fn(inner, img, can, insts, ctx_mask, rng):
                params = {"params": inner}
                rngs = {"dropout": rng} if train else None
                ctx = model.apply(params, can, img,
                                  deterministic=not train, rngs=rngs,
                                  method=SpeakerModel.encode)
                b = can.shape[0]
                h0 = jnp.zeros((b, self.cfg.rnn_dim), self.dtype)
                logits = model.apply(
                    params, insts, ctx, ctx_mask, h0, h0,
                    deterministic=not train,
                    rngs={"dropout": jax.random.fold_in(rng, 1)}
                    if train else None,
                    method=SpeakerModel.decode).astype(jnp.float32)
                # shift: predict insts[:,1:] from logits[:,:-1]
                logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
                tgt = insts[:, 1:]
                ce = -jnp.take_along_axis(logp, tgt[..., None],
                                          axis=-1)[..., 0]
                w = (tgt != PAD_IDX).astype(jnp.float32)
                loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
                pred = jnp.argmax(logits[:, :-1], axis=-1)
                correct = ((pred == tgt) & (tgt != PAD_IDX))
                word_accu = correct.sum() / jnp.maximum(w.sum(), 1)
                sent_accu = (correct.sum(1) == w.sum(1)).mean()
                return loss, (word_accu, sent_accu)

            if train:

                @jax.jit
                def run(params, opt_state, img, can, insts, ctx_mask, rng):
                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, has_aux=True)(params["params"], img, can,
                                               insts, ctx_mask, rng)
                    updates, opt_state = self.tx.update(
                        grads, opt_state, params["params"])
                    new = optax.apply_updates(params["params"], updates)
                    return {"params": new}, opt_state, loss, aux
            else:

                @jax.jit
                def run(params, img, can, insts, ctx_mask, rng):
                    return loss_fn(params["params"], img, can, insts,
                                   ctx_mask, rng)

            self._jit[key] = run
        return self._jit[key]

    def _infer_fn(self, t_steps: int, sampling: bool, use_mask: bool):
        key = ("infer", t_steps, sampling, use_mask)
        if key not in self._jit:
            model = self.model
            cfg = self.cfg
            bos = self.tok.word_to_index["<BOS>"]
            eos = self.tok.word_to_index["<EOS>"]
            unk = self.tok.word_to_index["<UNK>"]
            max_decode = cfg.max_decode

            @jax.jit
            def run(params, img, can, ctx_mask, featdropmask, rng):
                if use_mask:
                    a = cfg.angle_feat_size
                    img = jnp.concatenate(
                        [img[..., :-a] * featdropmask, img[..., -a:]], -1)
                    can = jnp.concatenate(
                        [can[..., :-a] * featdropmask, can[..., -a:]], -1)
                ctx = model.apply(params, can, img,
                                  already_dropfeat=True,
                                  deterministic=True,
                                  method=SpeakerModel.encode)
                b = can.shape[0]
                h = jnp.zeros((b, cfg.rnn_dim), self.dtype)
                c = jnp.zeros((b, cfg.rnn_dim), self.dtype)
                word0 = jnp.full((b,), bos, jnp.int32)
                ended0 = jnp.zeros((b,), bool)

                def body(carry, i):
                    word, h, c, ended = carry
                    logit, h, c = model.apply(
                        params, word, ctx, ctx_mask, h, c,
                        deterministic=True,
                        method=SpeakerModel.decode_step)
                    logit = logit.astype(jnp.float32).at[:, unk].set(
                        NEG_INF)
                    if sampling:
                        nxt = jax.random.categorical(
                            jax.random.fold_in(rng, i), logit, axis=-1)
                    else:
                        nxt = jnp.argmax(logit, axis=-1)
                    nxt = nxt.astype(jnp.int32)
                    out = jnp.where(ended, PAD_IDX, nxt)
                    ended = ended | (out == eos)
                    return (out, h, c, ended), out

                (_, _, _, _), words = jax.lax.scan(
                    body, (word0, h, c, ended0),
                    jnp.arange(max_decode, dtype=jnp.int32))
                return words.T  # (B, max_decode)

            self._jit[key] = run
        return self._jit[key]

    def _beam_infer_fn(self, t_steps: int, beam_size: int):
        """Jitted beam-search instruction decode (the generation-side
        counterpart of the reference decoder's beam-expansion
        multiplier, model.py:1060-1071): K hypotheses per trajectory
        decoded in one scan, context expanded per beam."""
        key = ("beam", t_steps, beam_size)
        if key not in self._jit:
            model = self.model
            cfg = self.cfg
            bos = self.tok.word_to_index["<BOS>"]
            eos = self.tok.word_to_index["<EOS>"]
            unk = self.tok.word_to_index["<UNK>"]
            max_decode = cfg.max_decode
            K = beam_size

            @jax.jit
            def run(params, img, can, ctx_mask):
                ctx = model.apply(params, can, img, already_dropfeat=True,
                                  deterministic=True,
                                  method=SpeakerModel.encode)
                b = can.shape[0]
                # beam-expansion: ctx rows repeated per beam (the
                # decoder's multiplier layout — row-major, beams of one
                # item contiguous)
                ctx_e = jnp.repeat(ctx, K, axis=0)
                mask_e = jnp.repeat(ctx_mask, K, axis=0)
                h = jnp.zeros((b * K, cfg.rnn_dim), self.dtype)
                c = jnp.zeros((b * K, cfg.rnn_dim), self.dtype)
                word0 = jnp.full((b, K), bos, jnp.int32)
                # only beam 0 is live at t=0 (identical starts would
                # fill the beam with duplicates)
                logp0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0,
                                  NEG_INF) * jnp.ones((b, 1))
                ended0 = jnp.zeros((b, K), bool)
                seqs0 = jnp.full((b, K, max_decode), PAD_IDX, jnp.int32)

                def body(carry, i):
                    word, h, c, logp, ended, seqs = carry
                    logit, h, c = model.apply(
                        params, word.reshape(b * K), ctx_e, mask_e, h, c,
                        deterministic=True,
                        method=SpeakerModel.decode_step)
                    lp = jax.nn.log_softmax(
                        logit.astype(jnp.float32).at[:, unk].set(NEG_INF),
                        axis=-1).reshape(b, K, -1)
                    v = lp.shape[-1]
                    # ended beams continue only via PAD at zero cost
                    pad_only = jnp.where(
                        jnp.arange(v)[None, None, :] == PAD_IDX, 0.0,
                        NEG_INF)
                    cand = logp[:, :, None] + jnp.where(
                        ended[:, :, None], pad_only, lp)   # (B, K, V)
                    top_lp, flat_ix = jax.lax.top_k(
                        cand.reshape(b, K * v), K)         # (B, K)
                    parent = flat_ix // v
                    token = (flat_ix % v).astype(jnp.int32)

                    def g2(x):  # gather beam-major state by parent
                        return jnp.take_along_axis(
                            x.reshape(b, K, -1), parent[:, :, None],
                            axis=1).reshape(b * K, -1)

                    h = g2(h)
                    c = g2(c)
                    seqs = jnp.take_along_axis(
                        seqs, parent[:, :, None], axis=1)
                    ended = jnp.take_along_axis(ended, parent, axis=1)
                    out = jnp.where(ended, PAD_IDX, token)
                    seqs = seqs.at[:, :, i].set(out)
                    ended = ended | (out == eos)
                    return (out, h, c, top_lp, ended, seqs), None

                (word, h, c, logp, ended, seqs), _ = jax.lax.scan(
                    body, (word0, h, c, logp0, ended0, seqs0),
                    jnp.arange(max_decode, dtype=jnp.int32))
                return seqs, logp

            self._jit[key] = run
        return self._jit[key]

    def beam_infer_batch(self, beam_size: int = 3):
        """Beam-decode instructions for the current batch's teacher
        trajectories.  Returns (words (B, K, max_decode), scores (B, K))
        sorted best-first per item."""
        rec, lengths = self.collect_teacher_path()
        img, can = self._gather_traj_feats(rec)
        t = rec["feat_row"].shape[1]
        ctx_mask = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])
        words, scores = self._beam_infer_fn(t, beam_size)(
            self.params, img, can, ctx_mask)
        return np.asarray(words), np.asarray(scores)

    # ------------------------------------------------------------------
    # public API (speaker.py contract)
    # ------------------------------------------------------------------
    def train(self, iters: int):
        losses = []
        for _ in range(iters):
            obs = self.env.reset()
            rec, lengths = self.collect_teacher_path()
            img, can = self._gather_traj_feats(rec)
            insts = jnp.asarray(obs.instr)
            t = rec["feat_row"].shape[1]
            ctx_mask = jnp.asarray(
                np.arange(t)[None, :] >= lengths[:, None])
            rng = jax.random.fold_in(self._rng, self._counter)
            self._counter += 1
            self.params, self.opt_state, loss, _ = self._tf_grad_fn(
                t, insts.shape[1], True)(
                self.params, self.opt_state, img, can, insts, ctx_mask,
                rng)
            losses.append(float(loss))
        return losses

    def teacher_forcing_eval(self):
        obs = self.env._get_obs()
        rec, lengths = self.collect_teacher_path()
        img, can = self._gather_traj_feats(rec)
        insts = jnp.asarray(obs.instr)
        t = rec["feat_row"].shape[1]
        ctx_mask = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])
        loss, (wa, sa) = self._tf_grad_fn(t, insts.shape[1], False)(
            self.params, img, can, insts, ctx_mask,
            jax.random.PRNGKey(0))
        return float(loss), float(wa), float(sa)

    def infer_batch(self, sampling: bool = False,
                    featdropmask=None) -> np.ndarray:
        rec, lengths = self.collect_teacher_path()
        img, can = self._gather_traj_feats(rec)
        t = rec["feat_row"].shape[1]
        ctx_mask = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])
        rng = jax.random.fold_in(self._rng, self._counter)
        self._counter += 1
        mask = (featdropmask if featdropmask is not None
                else jnp.ones((self.cfg.feature_size,), self.dtype))
        words = self._infer_fn(t, sampling, featdropmask is not None)(
            self.params, img, can, ctx_mask, mask, rng)
        return np.asarray(words)

    def get_insts(self):
        """Caption every item (speaker.py:62-74)."""
        self.env.reset_epoch(shuffle=True)
        path2inst = {}
        total = self.env.size()
        for _ in range(total // self.env.batch_size + 1):
            obs_batch = self.env.reset()
            insts = self.infer_batch()
            for item, inst in zip(self.env.batch, insts):
                if item["path_id"] not in path2inst:
                    path2inst[item["path_id"]] = self.tok.shrink(
                        list(inst))
        return path2inst

    def valid(self):
        path2inst = self.get_insts()
        self.env.reset_epoch(shuffle=True)
        n = 1 if self.cfg.fast_train else 3
        metrics = np.zeros(3)
        for _ in range(n):
            self.env.reset()
            metrics += np.array(self.teacher_forcing_eval())
        metrics /= n
        return (path2inst, *metrics)

    def score_instruction(self, rec: dict, insts: np.ndarray
                          ) -> np.ndarray:
        """Per-word CE of instructions given trajectory index records —
        the speaker side of beam rescoring (speaker.py teacher_forcing
        with for_listener=True, speaker.py:249-253).  rec fields are
        (B, T) stacks like collect_teacher_path's; returns (B, L-1)
        losses (PAD positions zeroed)."""
        img, can = self._gather_traj_feats(rec)
        t = rec["feat_row"].shape[1]
        lengths = rec["has_cand"].sum(1)
        ctx_mask = jnp.asarray(np.arange(t)[None, :] >= lengths[:, None])
        key = ("score", t, insts.shape[1])
        if key not in self._jit:
            model = self.model

            @jax.jit
            def run(params, img, can, insts, ctx_mask):
                ctx = model.apply(params, can, img, deterministic=True,
                                  method=SpeakerModel.encode)
                b = can.shape[0]
                h0 = jnp.zeros((b, self.cfg.rnn_dim), self.dtype)
                logits = model.apply(params, insts, ctx, ctx_mask, h0, h0,
                                     deterministic=True,
                                     method=SpeakerModel.decode)
                logp = jax.nn.log_softmax(
                    logits[:, :-1].astype(jnp.float32), axis=-1)
                tgt = insts[:, 1:]
                ce = -jnp.take_along_axis(logp, tgt[..., None],
                                          axis=-1)[..., 0]
                return jnp.where(tgt != PAD_IDX, ce, 0.0)

            self._jit[key] = run
        return np.asarray(self._jit[key](
            self.params, img, can, jnp.asarray(insts.astype(np.int32)),
            ctx_mask))

    def relabel_batch(self, env: R2REnv, env_noise, base_rng):
        """Back-translation for the listener's selfTrain path
        (agent_dg.py:656-675): generate instructions for the current
        batch, swap them in, and reset the env with the fake batch."""
        self.env = env
        batch = [dict(item) for item in env.batch]
        insts = self.infer_batch(featdropmask=env_noise)
        pad, eos = PAD_IDX, self.tok.word_to_index["<EOS>"]
        for datum, inst in zip(batch, insts):
            nz = np.nonzero(inst == pad)[0]
            end = int(nz[0]) if len(nz) else len(inst)
            inst = list(inst[:end])
            if inst and inst[-1] == eos:
                inst = inst[:-1]
            datum["instructions"] = self.tok.decode_sentence(inst)
            enc = self.tok.encode_sentence(datum["instructions"],
                                           max_length=self.cfg.max_input)
            if enc is None:
                enc = np.zeros(self.cfg.max_input, np.int64)
                enc[0] = self.tok.word_to_index["<BOS>"]
                enc[1] = eos
            datum["instr_encoding"] = enc
        return env.reset(batch)

    # ------------------------------------------------------------------
    def save(self, epoch: int, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = {"epoch": epoch,
                "params": serialization.to_bytes(self.params),
                "opt_state": serialization.to_bytes(self.opt_state)}
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    def load(self, path: str) -> int:
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = serialization.from_bytes(self.params,
                                               blob["params"])
        if self.cfg.load_optim:
            self.opt_state = serialization.from_bytes(
                self.opt_state, blob["opt_state"])
        return blob["epoch"]
