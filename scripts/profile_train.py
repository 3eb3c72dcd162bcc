"""Stage-isolation profile of the train step on the real chip.

Times (slope method — see bench.py) progressively larger pieces:

  1. backbone + RPN head forward
  2. full compute_losses forward (adds proposal gen 12000->2000 NMS,
     RPN target assignment, both samplers, RoI pool, detector head, losses)
  3. value_and_grad of compute_losses (adds the backward pass)
  4. full train step (adds optimizer update)

Usage:  python scripts/profile_train.py   (several minutes of compiles)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fasterrcnn_tpu.config import ModelConfig, TrainConfig
from fasterrcnn_tpu.engine import make_optimizer
from fasterrcnn_tpu.models.faster_rcnn import (
    Batch,
    FasterRCNN,
    anchor_grid_for,
    compute_losses,
    init_params,
    make_train_step,
)

B = int(os.environ.get("PROF_TRAIN_BATCH", "8"))
H, W = 608, 800
LO, HI = 4, 12


from fasterrcnn_tpu.utils.timing import slope_ms


def slope(fn, fetch, lo=LO, hi=HI):
    fn(); fetch()  # compile + warm
    return slope_ms(fn, fetch, lo, hi)


def main():
    cfg = ModelConfig(backbone="vgg16", compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, H, W, seed=0)
    grid = anchor_grid_for(cfg, H, W)
    rng = np.random.default_rng(0)
    g = cfg.max_gt_boxes
    batch = Batch(
        images=jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)),
        image_hw=jnp.tile(jnp.asarray([[600.0, 800.0]], jnp.float32), (B, 1)),
        gt_boxes=jnp.tile(
            jnp.asarray([[[100.0, 100.0, 400.0, 500.0]] + [[0.0] * 4] * (g - 1)]),
            (B, 1, 1),
        ).astype(jnp.float32),
        gt_classes=jnp.tile(jnp.asarray([[5] + [0] * (g - 1)], jnp.int32), (B, 1)),
        gt_mask=jnp.tile(jnp.asarray([[1.0] + [0.0] * (g - 1)], jnp.float32), (B, 1)),
        sample_weight=jnp.ones((B,), jnp.float32),
    )
    key = jax.random.key(0)
    state = {}

    @jax.jit
    def s1(params, images):
        fm, logits, deltas = model.apply(
            {"params": params}, images, method=FasterRCNN.features_and_rpn
        )
        return logits
    def r1():
        state["o"] = s1(params, batch.images)
    t1 = slope(r1, lambda: float(state["o"].astype(jnp.float32).sum()))
    print(f"fwd backbone+rpn_head : {t1:7.2f} ms/batch")

    @jax.jit
    def s2(params, batch, key):
        total, _ = compute_losses(model, params, batch, key, cfg, grid)
        return total
    def r2():
        state["o"] = s2(params, batch, key)
    t2 = slope(r2, lambda: float(state["o"]))
    print(f"fwd full losses       : {t2:7.2f} ms/batch (proposals+sampling+roi+det: {t2-t1:+.2f})")

    @jax.jit
    def s3(params, batch, key):
        (total, _), grads = jax.value_and_grad(
            lambda p: compute_losses(model, p, batch, key, cfg, grid), has_aux=True
        )(params)
        return total
    def r3():
        state["o"] = s3(params, batch, key)
    t3 = slope(r3, lambda: float(state["o"]))
    print(f"+ backward            : {t3:7.2f} ms/batch (bwd: {t3-t2:+.2f})")

    tx, _ = make_optimizer(cfg, TrainConfig(), params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, H, W)
    st = {"p": params, "o": opt_state, "l": None}
    def r4():
        st["p"], st["o"], st["l"] = step(st["p"], st["o"], batch, key)
    t4 = slope(r4, lambda: float(st["l"].total))
    print(f"full train step       : {t4:7.2f} ms/batch (optimizer: {t4-t3:+.2f})")
    print(f"-> {B / (t4 / 1e3):.1f} images/sec")


if __name__ == "__main__":
    main()
