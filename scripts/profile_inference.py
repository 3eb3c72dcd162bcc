"""Stage-isolation profile of the inference pipeline on the real chip.

Times (slope method — see bench.py docstring for why) progressively larger
prefixes of the predict program at production shapes, so stage costs fall
out by subtraction:

  1. backbone + RPN head               (features_and_rpn)
  2. + proposal generation             (top-k, decode, RPN NMS)
  3. + RoI pool + detector head        (detect_rois)
  4. + per-class decode + NMS          (full predict)

Also times the train-shape proposal pipeline (12000 -> 2000 NMS), XLA
blocked path vs Pallas kernel — the round-1 verdict flagged train-time NMS
cost as unmeasured.

Usage (takes ~10 min of compiles):  python scripts/profile_inference.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fasterrcnn_tpu.config import ModelConfig
from fasterrcnn_tpu.models.faster_rcnn import (
    FasterRCNN,
    anchor_grid_for,
    init_params,
    make_predict_fn,
    proposal_masks,
)
from fasterrcnn_tpu.models.rpn import generate_proposals
from fasterrcnn_tpu.ops import nms as nms_ops

B = int(os.environ.get("PROF_BATCH", "32"))
H, W = 608, 800
LO, HI = 4, 16


from fasterrcnn_tpu.utils.timing import slope_ms


def slope(fn, fetch, lo=LO, hi=HI):
    fn(); fetch()  # compile + warm
    return slope_ms(fn, fetch, lo, hi)


def main():
    cfg = ModelConfig(backbone="vgg16", compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, H, W, seed=0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    image_hw = jnp.tile(jnp.asarray([[600.0, 800.0]], jnp.float32), (B, 1))
    grid = anchor_grid_for(cfg, H, W)
    centers = jnp.asarray(grid.centers)

    state = {}

    # 1. backbone + RPN head
    @jax.jit
    def stage1(params, images):
        return model.apply({"params": params}, images, method=FasterRCNN.features_and_rpn)

    state["s1"] = None
    def run1():
        state["s1"] = stage1(params, images)
    t1 = slope(run1, lambda: float(state["s1"][1].astype(jnp.float32).sum()))
    print(f"backbone+rpn_head         : {t1:7.2f} ms/batch")

    # 2. + proposals (infer caps 6000 -> 300)
    def proposals_from(logits, deltas, hw, pre, post, use_pallas):
        return jax.vmap(
            lambda lg, dl, h: generate_proposals(
                lg, dl, centers, proposal_masks(cfg, grid, h)[0], h[0], h[1],
                pre, post, cfg.rpn.nms_iou_threshold, cfg.rpn.min_proposal_side,
                use_pallas=use_pallas,
            )
        )(logits, deltas, hw)

    @jax.jit
    def stage2(params, images, image_hw):
        fm, logits, deltas = model.apply(
            {"params": params}, images, method=FasterRCNN.features_and_rpn
        )
        return proposals_from(logits, deltas, image_hw,
                              cfg.rpn.pre_nms_infer, cfg.rpn.post_nms_infer,
                              nms_ops.default_backend_uses_pallas())

    def run2():
        state["s2"] = stage2(params, images, image_hw)
    t2 = slope(run2, lambda: float(state["s2"].boxes.sum()))
    print(f"+ proposal gen (RPN NMS)  : {t2:7.2f} ms/batch (stage: {t2-t1:+.2f})")

    # 3. + RoI pool + detector head
    @jax.jit
    def stage3(params, images, image_hw):
        fm, logits, deltas = model.apply(
            {"params": params}, images, method=FasterRCNN.features_and_rpn
        )
        props = proposals_from(logits, deltas, image_hw,
                               cfg.rpn.pre_nms_infer, cfg.rpn.post_nms_infer,
                               nms_ops.default_backend_uses_pallas())
        return model.apply(
            {"params": params}, fm, props.boxes, image_hw,
            method=FasterRCNN.detect_rois,
        )

    def run3():
        state["s3"] = stage3(params, images, image_hw)
    t3 = slope(run3, lambda: float(state["s3"][0].astype(jnp.float32).sum()))
    print(f"+ roi pool + det head     : {t3:7.2f} ms/batch (stage: {t3-t2:+.2f})")

    # 4. full predict
    predict = make_predict_fn(model, H, W)
    def run4():
        state["s4"] = predict(params, images, image_hw, score_threshold=0.05)
    t4 = slope(run4, lambda: float(state["s4"].scores.sum()))
    print(f"full predict              : {t4:7.2f} ms/batch (per-class NMS: {t4-t3:+.2f})")
    print(f"-> {B / (t4 / 1e3):.1f} images/sec")

    # Train-shape proposal pipeline (12000 -> 2000), XLA vs Pallas.
    fm, logits, deltas = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=FasterRCNN.features_and_rpn)
    )(params, images[:8])
    hw8 = image_hw[:8]
    for name, use_pallas in (("xla-blocked", False), ("pallas", True)):
        f = jax.jit(lambda lg, dl, h, up=use_pallas: proposals_from(
            lg, dl, h, cfg.rpn.pre_nms_train, cfg.rpn.post_nms_train, up))
        def runp():
            state["p"] = f(logits, deltas, hw8)
        tp = slope(runp, lambda: float(state["p"].boxes.sum()))
        print(f"train NMS 12000->2000 B=8 [{name}]: {tp:7.2f} ms/batch")


if __name__ == "__main__":
    main()
