"""Headline benchmark: batched fixed-shape inference throughput on one chip.

Runs the flagship VGG-16 Faster R-CNN on a 608x800 canvas at batch size 32
(bfloat16 compute path) over synthetic data and reports steady-state
images/sec. Baseline: 100 images/sec/chip (BASELINE.json acceptance target;
the reference publishes no throughput numbers at all — see BASELINE.md).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMAGES_PER_SEC = 100.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fasterrcnn_tpu.config import ModelConfig
    from fasterrcnn_tpu.models.faster_rcnn import (
        FasterRCNN,
        init_params,
        make_predict_fn,
    )

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    canvas_h, canvas_w = 608, 800
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    cfg = ModelConfig(backbone="vgg16", compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, canvas_h, canvas_w, seed=0)
    predict = make_predict_fn(model, canvas_h, canvas_w)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch_size, canvas_h, canvas_w, 3), dtype=np.uint8)
    )
    image_hw = jnp.tile(
        jnp.asarray([[600.0, 800.0]], jnp.float32), (batch_size, 1)
    )

    # Warm-up / compile.
    det = predict(params, images, image_hw, score_threshold=0.05)
    jax.block_until_ready(det)

    start = time.perf_counter()
    for _ in range(iters):
        det = predict(params, images, image_hw, score_threshold=0.05)
    jax.block_until_ready(det)
    elapsed = time.perf_counter() - start

    images_per_sec = batch_size * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "VGG16 FasterRCNN batched inference (608x800, bs=%d, bf16)"
                % batch_size,
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
