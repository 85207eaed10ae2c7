"""Optimizers and LR schedules.

Reproduces the reference's per-component optimizer setup
(agent_dg.py:213-241): separate optimizers for encoder / decoder / critic
/ adain (same base LR), a warmup + step-decay LambdaLR applied to
decoder/critic/adain only, and grad-norm clipping (40) on encoder and
decoder only (agent_dg.py:1391-1393).  Implemented as one
optax.multi_transform keyed on the policy's top-level submodule names.

`scale_by_torch_rms` matches torch.optim.RMSprop exactly (eps added
*outside* the sqrt), which optax's rmsprop does not.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from dasa_tpu.config import Config

CLIP_NORM = 40.0


def lr_lambda(cfg: Config) -> Callable[[int], float]:
    """Warmup + step decay multiplier (agent_dg.py:219-229)."""

    def fn(it):
        warm = jnp.asarray(cfg.warm_steps)
        alpha_warm = (1.0 + it) / jnp.maximum(warm, 1)
        n_decays = (it - cfg.decay_start) // cfg.decay_intervals
        alpha_decay = cfg.lr_decay ** n_decays
        alpha = jnp.where(
            (cfg.warm_steps > 0) & (it < warm), alpha_warm,
            jnp.where(it < cfg.decay_start, 1.0, alpha_decay))
        return alpha

    return fn


def scale_by_torch_rms(decay: float = 0.99, eps: float = 1e-8):
    """torch RMSprop: nu = a*nu + (1-a)*g^2; update = g / (sqrt(nu)+eps)."""

    def init_fn(params):
        return {"nu": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(updates, state, params=None):
        nu = jax.tree_util.tree_map(
            lambda n, g: decay * n + (1 - decay) * (g * g), state["nu"],
            updates)
        updates = jax.tree_util.tree_map(
            lambda g, n: g / (jnp.sqrt(n) + eps), updates, nu)
        return updates, {"nu": nu}

    return optax.GradientTransformation(init_fn, update_fn)


def _base_opt(cfg: Config, schedule: Optional[Callable]):
    lr = cfg.lr
    if schedule is not None:
        lr_sched = lambda it: cfg.lr * schedule(it)  # noqa: E731
    else:
        lr_sched = lr
    parts = []
    if cfg.weight_decay and cfg.optim != "adamw":
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.optim == "rms":
        parts.append(scale_by_torch_rms())
    elif cfg.optim == "adam":
        parts.append(optax.scale_by_adam())
    elif cfg.optim == "adamw":
        parts.append(optax.scale_by_adam())
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    elif cfg.optim == "sgd":
        pass
    else:
        raise ValueError(cfg.optim)
    parts.append(optax.scale_by_learning_rate(lr_sched))
    return optax.chain(*parts)


def build_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    """Per-submodule transforms over the policy param tree."""
    sched = lr_lambda(cfg) if cfg.use_lr_scheduler else None
    transforms = {
        "encoder": optax.chain(optax.clip_by_global_norm(CLIP_NORM),
                               _base_opt(cfg, None)),
        "decoder": optax.chain(optax.clip_by_global_norm(CLIP_NORM),
                               _base_opt(cfg, sched)),
        "critic": _base_opt(cfg, sched),
        "adain": _base_opt(cfg, sched),
        "other": _base_opt(cfg, None),
    }

    def label(params):
        return {k: (k if k in transforms else "other") for k in params}

    return optax.multi_transform(transforms, label)
