"""--lr-schedule cosine (warmup + cosine decay): optimizer-level behavior."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.config import ModelConfig, TrainConfig
from fasterrcnn_tpu.engine import make_optimizer


def _tiny_params():
    return {"head": {"kernel": jnp.ones((3,), jnp.float32)}}


def test_cosine_requires_total_steps():
    cfg = TrainConfig(lr_schedule="cosine", warmup_steps=2, total_steps=0)
    with pytest.raises(ValueError, match="total_steps"):
        make_optimizer(ModelConfig(), cfg, _tiny_params())


def test_cosine_warms_up_then_decays():
    cfg = TrainConfig(
        learning_rate=1e-2,
        lr_schedule="cosine",
        warmup_steps=2,
        total_steps=10,
        weight_decay=0.0,
        momentum=0.0,
    )
    params = _tiny_params()
    tx, _ = make_optimizer(ModelConfig(), cfg, params)
    state = tx.init(params)
    grads = {"head": {"kernel": jnp.ones((3,), jnp.float32)}}
    sizes = []
    for _ in range(10):
        updates, state = tx.update(grads, state, params)
        sizes.append(float(jnp.abs(updates["head"]["kernel"][0])))
    # Linear warmup: step sizes rise to the peak, then cosine-decay toward 0.
    assert sizes[1] > sizes[0]
    peak = int(np.argmax(sizes))
    assert peak <= 2
    assert sizes[-1] < 0.2 * max(sizes)
    np.testing.assert_allclose(max(sizes), 1e-2, rtol=0.35)


def test_constant_schedule_unchanged():
    cfg = TrainConfig(learning_rate=1e-2, weight_decay=0.0, momentum=0.0)
    params = _tiny_params()
    tx, _ = make_optimizer(ModelConfig(), cfg, params)
    state = tx.init(params)
    grads = {"head": {"kernel": jnp.ones((3,), jnp.float32)}}
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        np.testing.assert_allclose(
            np.abs(np.asarray(updates["head"]["kernel"])), 1e-2, rtol=1e-6
        )
