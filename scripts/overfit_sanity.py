"""End-to-end learning sanity check: overfit 4 synthetic images to 100% mAP.

The strongest available correctness evidence without VOC data on disk: a
working implementation of proposal labeling, minibatch sampling, all four
losses, gradients, and the eval protocol must drive train-set mAP to ~100%
on the solid-rectangle synthetic set. A sign/assignment bug anywhere in the
pipeline keeps mAP near zero even while losses decrease.

Verified on TPU v5e-1: mAP = 100.0% after 150 epochs for BOTH backbones
(~10 min each incl. compiles). Run:
  python scripts/overfit_sanity.py
  OVERFIT_BACKBONE=resnet50 python scripts/overfit_sanity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

from fasterrcnn_tpu.config import (
    AnchorConfig,
    DetectorConfig,
    ModelConfig,
    RPNConfig,
    TrainConfig,
)
from fasterrcnn_tpu.data.synthetic import SyntheticDataset
from fasterrcnn_tpu.engine import Engine


def tiny_config() -> ModelConfig:
    """Small canvas + scaled anchors (mirrors tests/test_model.py)."""
    return ModelConfig(
        num_classes=21,
        backbone=os.environ.get("OVERFIT_BACKBONE", "vgg16"),
        anchors=AnchorConfig(areas=(24.0 * 24, 48.0 * 48, 96.0 * 96)),
        rpn=RPNConfig(
            pre_nms_train=400,
            post_nms_train=128,
            pre_nms_infer=200,
            post_nms_infer=64,
            minibatch_size=64,
        ),
        detector=DetectorConfig(proposal_batch_size=32),
        max_gt_boxes=8,
    )


def main() -> None:
    epochs = int(os.environ.get("OVERFIT_EPOCHS", "150"))
    engine = Engine(
        tiny_config(),
        TrainConfig(learning_rate=2e-3, batch_size=4, weight_decay=0.0),
        seed=0,
        init_canvas=(128, 160),
    )
    data = SyntheticDataset(num_samples=4, height=120, width=150, seed=3)
    for epoch in range(1, epochs + 1):
        stats = engine.train_epoch(data, batch_size=4, progress=False)
        if epoch % 10 == 0:
            means = stats.means()
            print(
                f"epoch {epoch:3d}: "
                + " ".join(f"{k}={v:.3f}" for k, v in means.items()),
                flush=True,
            )
    mAP = engine.evaluate(data, batch_size=4, progress=False, score_threshold=0.05)
    print(f"overfit mAP on train images: {mAP:.1f}%")
    if mAP < 90.0:
        raise SystemExit(f"FAIL: expected ~100% overfit mAP, got {mAP:.1f}%")
    print("PASS")


if __name__ == "__main__":
    main()
