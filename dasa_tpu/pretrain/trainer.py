"""Distributed pretraining driver.

Replaces the reference's NCCL DDP pretrainer (tasks/R2R/
nav_dic_pretrain.py: torch.distributed init at 765, DDP wrapper at
250-256, AdamW + WarmupLinearSchedule at 210-224, rank-0 checkpoints at
366-382) with one pjit program over a ('data','model') mesh: batches are
sharded on `data`, parameters replicated, and GSPMD inserts the gradient
all-reduce.  Multi-host runs call jax.distributed.initialize() before
this; checkpointing happens on process 0 only.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from dasa_tpu.config import Config
from dasa_tpu.models.featurize import assemble_pano
from dasa_tpu.models.policy import bert_config_from
from dasa_tpu.parallel import make_mesh, replicate, shard_batch
from dasa_tpu.pretrain.data import PretrainBatcher, generate_pretrain_records
from dasa_tpu.pretrain.model import DicAddActionPreTrain
from dasa_tpu.utils.angles import all_point_angle_feature


def warmup_linear(lr: float, warmup_steps: int, total_steps: int):
    """WarmupLinearSchedule (nav_dic_pretrain.py:222-224)."""

    def fn(step):
        warm = jnp.maximum(warmup_steps, 1)
        frac_w = step / warm
        frac_d = jnp.maximum(
            0.0, (total_steps - step) /
            jnp.maximum(total_steps - warmup_steps, 1))
        return lr * jnp.where(step < warmup_steps, frac_w, frac_d)

    return fn


def build_adamw(cfg: Config, params, total_steps: int):
    """AdamW with the no-decay split for bias/LayerNorm params
    (nav_dic_pretrain.py:210-219)."""
    sched = warmup_linear(cfg.lr, cfg.warm_steps, total_steps)

    def decay_mask(tree):
        def is_decay(path, _):
            name = "/".join(str(p.key) for p in path
                            if hasattr(p, "key")).lower()
            return not ("layernorm" in name or name.endswith("bias")
                        or name.endswith("/b"))

        return jax.tree_util.tree_map_with_path(is_decay, tree)

    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(),
        optax.add_decayed_weights(0.01, mask=decay_mask),
        optax.scale_by_learning_rate(sched),
    )


class Pretrainer:
    def __init__(self, cfg: Config, feature_db, vocab_size: int,
                 mesh=None, dtype=None):
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        if dtype is None:
            dtype = (jnp.float32 if jax.default_backend() == "cpu"
                     else {"float32": jnp.float32,
                           "bfloat16": jnp.bfloat16}[cfg.compute_dtype])
        self.dtype = dtype
        import dataclasses

        # the pretrainer's MLM head targets the word tokenizer's vocab;
        # pretraining trains the WHOLE model — the reference forces
        # update_lang_bert/update_add_layer True in its pretrain config
        # (prevalent_pretrain.py:224-225, nav_dic_pretrain.py:686) and
        # only flips to the finetune flags at listener init (239-240);
        # inheriting the listener's d_update_* here would stop-gradient
        # the cross-modal layers and pretrain nothing but the text stack
        bc = dataclasses.replace(bert_config_from(cfg),
                                 vocab_size=vocab_size,
                                 update_lang_bert=True,
                                 update_add_layer=True)
        self.bert_config = bc
        self.model = DicAddActionPreTrain(bc, dtype)
        b, L = 2, cfg.max_input
        self.params = self.model.init(
            jax.random.PRNGKey(cfg.seed),
            jnp.zeros((b, L), jnp.int32),
            jnp.full((b, L), -1, jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, cfg.views, cfg.feature_all_size), dtype),
            jnp.ones((b, L), jnp.int32))
        self.tx = build_adamw(cfg, self.params["params"], cfg.iters)
        self.opt_state = self.tx.init(self.params["params"])
        self.feat_table = jnp.asarray(feature_db.values, dtype)
        self.angle_table = jnp.asarray(
            all_point_angle_feature(cfg.angle_feat_size), dtype)
        self.step_count = 0
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        model = self.model
        tx = self.tx
        use_isnext = self.cfg.pretrain_isnext

        @jax.jit
        def step(params, opt_state, feat_table, angle_table, batch, rng):
            def loss_fn(inner):
                img = assemble_pano(feat_table, angle_table,
                                    batch["feat_row"],
                                    batch["view_index"])
                kw = {}
                if use_isnext:
                    # real-or-fake next-step pano for the NSP-style
                    # objective (batch_loader.py:419-432)
                    kw["next_img"] = assemble_pano(
                        feat_table, angle_table, batch["next_feat_row"],
                        batch["next_view"])
                    kw["isnext"] = batch["isnext"]
                out = model.apply(
                    {"params": inner}, batch["seq"], batch["labels"],
                    batch["action"], img, batch["lang_mask"],
                    deterministic=False, rngs={"dropout": rng}, **kw)
                loss, mlm_logits, action_logits = out[:3]
                # accuracy logs
                mlm_pred = jnp.argmax(mlm_logits, -1)
                m = batch["labels"] >= 0
                mlm_acc = (jnp.where(m, mlm_pred == batch["labels"],
                                     False).sum()
                           / jnp.maximum(m.sum(), 1))
                act_acc = (jnp.argmax(action_logits, -1)
                           == batch["action"]).mean()
                aux = {"mlm_acc": mlm_acc, "act_acc": act_acc}
                if use_isnext:
                    aux["isnext_acc"] = (
                        jnp.argmax(out[3], -1) == batch["isnext"]).mean()
                return loss, aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params["params"])
            updates, opt_state = tx.update(grads, opt_state,
                                           params["params"])
            new = optax.apply_updates(params["params"], updates)
            return {"params": new}, opt_state, loss, aux

        return step

    def shard_inputs(self):
        """Place params/tables per the mesh (replicated) once."""
        self.params = {"params": replicate(self.params["params"],
                                           self.mesh)}
        self.opt_state = replicate(self.opt_state, self.mesh)
        self.feat_table = replicate(self.feat_table, self.mesh)
        self.angle_table = replicate(self.angle_table, self.mesh)

    def train_step(self, batch: dict, rng) -> tuple:
        batch = shard_batch(batch, self.mesh)
        with self.mesh:
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, self.feat_table,
                self.angle_table, batch, rng)
        self.step_count += 1
        return float(loss), {k: float(v) for k, v in aux.items()}

    def evaluate(self, batcher, max_batches: int = 50) -> dict:
        """Held-out MLM/action accuracy (the reference's ValidBatch
        evaluation role, r2r_src/validation.py + testpretrain.py)."""
        if "eval" not in self.__dict__:
            model = self.model

            @jax.jit
            def eval_step(params, feat_table, angle_table, batch):
                img = assemble_pano(feat_table, angle_table,
                                    batch["feat_row"],
                                    batch["view_index"])
                loss, mlm_logits, action_logits = model.apply(
                    params, batch["seq"], batch["labels"],
                    batch["action"], img, batch["lang_mask"],
                    deterministic=True)
                m = batch["labels"] >= 0
                mlm_acc = (jnp.where(
                    m, jnp.argmax(mlm_logits, -1) == batch["labels"],
                    False).sum() / jnp.maximum(m.sum(), 1))
                act_acc = (jnp.argmax(action_logits, -1)
                           == batch["action"]).mean()
                return loss, mlm_acc, act_acc

            self.eval = eval_step
        tot = np.zeros(3)
        n = 0
        for batch in batcher.epoch():
            batch = shard_batch(batch, self.mesh)
            with self.mesh:
                out = self.eval(self.params, self.feat_table,
                                self.angle_table, batch)
            tot += np.array([float(x) for x in out])
            n += 1
            if n >= max_batches:
                break
        tot /= max(n, 1)
        return {"loss": tot[0], "mlm_acc": tot[1], "act_acc": tot[2]}

    def save(self, path: str):
        if jax.process_index() != 0:
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({"step": self.step_count,
                         "params": serialization.to_bytes(self.params)},
                        f)

    def load(self, path: str):
        with open(path, "rb") as f:
            blob = pickle.load(f)
        self.params = serialization.from_bytes(self.params,
                                               blob["params"])
        self.step_count = blob["step"]

    def export_bert_params(self):
        """The DicModel subtree, importable into DasaPolicy's encoder
        (the reference's `self.encoder.bert = premodel.bert`,
        agent_dg.py:182-188)."""
        return self.params["params"]["bert"]


def run_pretrain(cfg: Config, world=None) -> Pretrainer:
    """CLI mode `pretrain`: generate step records from the teacher paths
    and run the MLM+action objective data-parallel."""
    from dasa_tpu.train.trainer import World

    world = world or World(cfg)
    tok = world.tok
    if "<MASK>" not in tok.word_to_index:
        tok.add_word("<MASK>")
    env = world.envs["train"]
    records = generate_pretrain_records(env, max_steps=cfg.max_action)
    print(f"pretrain records: {len(records)}")
    n_val = max(cfg.batch_size, len(records) // 20)
    val_records, records = records[:n_val], records[n_val:]
    batcher = PretrainBatcher(records, cfg.batch_size, len(tok),
                              tok.word_to_index["<MASK>"], seed=cfg.seed,
                              mask_rate=cfg.word_mask_rate)
    val_batcher = PretrainBatcher(val_records, cfg.batch_size, len(tok),
                                  tok.word_to_index["<MASK>"],
                                  seed=cfg.seed + 1,
                                  mask_rate=cfg.word_mask_rate)
    pt = Pretrainer(cfg, world.feature_db, len(tok))
    pt.shard_inputs()
    rng = jax.random.PRNGKey(cfg.seed + 3)
    snap_dir = os.path.join(cfg.snap_dir, cfg.name, "pretrain")
    start = time.time()
    it = 0
    while it < cfg.iters:
        for batch in batcher.epoch():
            loss, aux = pt.train_step(
                batch, jax.random.fold_in(rng, it))
            it += 1
            if it % cfg.log_every == 0:
                metrics = " ".join(f"{k} {v:.3f}"
                                   for k, v in sorted(aux.items()))
                print(f"pretrain iter {it}: loss {loss:.4f} {metrics} "
                      f"({time.time() - start:.0f}s)", flush=True)
            if it % cfg.val_every == 0:
                val = pt.evaluate(val_batcher, max_batches=10)
                print(f"pretrain VAL iter {it}: loss {val['loss']:.4f} "
                      f"mlm_acc {val['mlm_acc']:.3f} "
                      f"act_acc {val['act_acc']:.3f}", flush=True)
            if it % cfg.save_every == 0 or it >= cfg.iters:
                pt.save(os.path.join(snap_dir, f"checkpoint-{it}"))
            if it >= cfg.iters:
                break
    pt.save(os.path.join(snap_dir, f"checkpoint-{it}"))
    return pt
