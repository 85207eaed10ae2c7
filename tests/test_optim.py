"""Optimizer parity tests: torch-exact RMSProp, warmup/decay schedule,
per-component transform selection."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dasa_tpu.config import Config
from dasa_tpu.train.optim import (
    CLIP_NORM,
    build_optimizer,
    lr_lambda,
    scale_by_torch_rms,
)


def test_rmsprop_matches_torch():
    """Our scale_by_torch_rms must track torch.optim.RMSprop step for
    step on the same gradients."""
    import torch

    w0 = np.array([1.5, -2.0, 0.5], np.float64)
    lr = 0.01
    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.RMSprop([tw], lr=lr, alpha=0.99, eps=1e-8)

    tx = optax.chain(scale_by_torch_rms(),
                     optax.scale_by_learning_rate(lr))
    jw = jnp.asarray(w0)
    state = tx.init(jw)

    rng = np.random.default_rng(0)
    for _ in range(25):
        g = rng.normal(size=3)
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()
        updates, state = tx.update(jnp.asarray(g), state, jw)
        jw = optax.apply_updates(jw, updates)
        np.testing.assert_allclose(np.asarray(jw),
                                   tw.detach().numpy(), rtol=1e-6,
                                   atol=1e-8)


def test_lr_lambda_schedule():
    cfg = Config(warm_steps=10, decay_start=40, decay_intervals=20,
                 lr_decay=0.5)
    fn = lr_lambda(cfg)
    # warmup: (1 + it) / warm_steps (agent_dg.py:221-222)
    assert float(fn(0)) == pytest.approx(0.1)
    assert float(fn(9)) == pytest.approx(1.0)
    # plateau
    assert float(fn(20)) == pytest.approx(1.0)
    assert float(fn(39)) == pytest.approx(1.0)
    # step decay: lr_decay ** ((it - start) // interval)
    assert float(fn(40)) == pytest.approx(1.0)   # (40-40)//20 = 0
    assert float(fn(60)) == pytest.approx(0.5)
    assert float(fn(80)) == pytest.approx(0.25)
    assert float(fn(100)) == pytest.approx(0.125)


def test_component_transforms_clip_encoder_decoder_only():
    """Encoder/decoder grads are norm-clipped at 40; critic/adain are
    not (agent_dg.py:1391-1393)."""
    cfg = Config(optim="sgd", lr=1.0, use_lr_scheduler=False)
    params = {
        "encoder": {"w": jnp.zeros(3)},
        "decoder": {"w": jnp.zeros(3)},
        "critic": {"w": jnp.zeros(3)},
        "adain": {"w": jnp.zeros(3)},
    }
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    big = {k: {"w": jnp.full(3, 1000.0)} for k in params}
    updates, _ = tx.update(big, state, params)
    enc_norm = float(jnp.linalg.norm(updates["encoder"]["w"]))
    crit_norm = float(jnp.linalg.norm(updates["critic"]["w"]))
    assert enc_norm == pytest.approx(CLIP_NORM, rel=1e-5)
    assert crit_norm == pytest.approx(
        float(jnp.linalg.norm(big["critic"]["w"])), rel=1e-5)


def test_scheduler_applies_to_decoder_not_encoder():
    cfg = Config(optim="sgd", lr=1.0, use_lr_scheduler=True,
                 warm_steps=0, decay_start=0, decay_intervals=1,
                 lr_decay=0.5)
    params = {"encoder": {"w": jnp.zeros(1)},
              "decoder": {"w": jnp.zeros(1)},
              "critic": {"w": jnp.zeros(1)},
              "adain": {"w": jnp.zeros(1)}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    g = {k: {"w": jnp.ones(1)} for k in params}
    # step 0: decay factor 0.5**0 = 1 -> all lr 1
    u0, state = tx.update(g, state, params)
    # step 2: decoder lr = 0.5**2 = 0.25, encoder stays 1.0
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    assert float(u2["encoder"]["w"][0]) == pytest.approx(-1.0)
    assert float(u2["decoder"]["w"][0]) == pytest.approx(-0.25)
    assert float(u2["critic"]["w"][0]) == pytest.approx(-0.25)
