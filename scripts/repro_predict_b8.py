#!/usr/bin/env python
"""Minimal repro of the single-chip TPU compiler fault at predict batch 8.

On the axon/libtpu stack in this environment (bisected in round 3), the
fully-fused predict program at batch EXACTLY 8 on a 608x800 canvas crashes
the TPU worker process — a compiler fusion/scheduling fault, not a semantics
bug:

  * B=4 / B=16 / B=32 run the identical program fine;
  * every predict substage run as its own jit program at B=8 runs fine;
  * disabling the Pallas NMS and/or RoI kernels changes nothing;
  * the per-class detection cap (100 vs 300) changes nothing.

The shipped mitigation (models/faster_rcnn.make_predict_fn) transparently
runs a B=8 predict as two B=4 halves of the same jitted program
(bit-identical output, tested in
tests/test_model.py::test_predict_b8_split_matches_fused). This script
exists so the underlying fault can be re-tested on future toolchains and
reported upstream. It is NOT run by CI or the test suite — expect it to
KILL the TPU worker on affected stacks (the process dies or hangs; run it
under `timeout`).

Usage (requires the real TPU backend; refuses to run without --yes):

    timeout 900 python scripts/repro_predict_b8.py --yes

Exit 0 + "SURVIVED" means the toolchain is fixed: remove the B=8 split in
models/faster_rcnn.py (or set FRCNN_NO_PREDICT_B8_SPLIT=1) after re-testing.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yes", action="store_true",
                   help="Confirm: this may crash the TPU worker process")
    p.add_argument("--batch", type=int, default=8,
                   help="Batch size (8 = the faulting shape; try 4/16 as "
                        "controls)")
    args = p.parse_args()
    if not args.yes:
        p.error("pass --yes to confirm (this can kill the TPU worker)")

    # The workaround must be disabled for the fused B=8 program to build.
    os.environ["FRCNN_NO_PREDICT_B8_SPLIT"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fasterrcnn_tpu.config import ModelConfig
    from fasterrcnn_tpu.models.faster_rcnn import (
        FasterRCNN,
        init_params,
        make_predict_fn,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    if jax.default_backend() != "tpu":
        print("NOTE: fault only reproduces on the TPU backend; this run is "
              "a control, not a repro.")

    cfg = ModelConfig(backbone="vgg16", compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    canvas_h, canvas_w = 608, 800
    params = init_params(model, canvas_h, canvas_w, seed=0)
    predict = make_predict_fn(model, canvas_h, canvas_w)

    b = args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (b, canvas_h, canvas_w, 3), dtype=np.uint8)
    )
    image_hw = jnp.tile(jnp.asarray([[600.0, 800.0]], jnp.float32), (b, 1))

    print(f"compiling + running fused predict at B={b} (608x800)...",
          flush=True)
    det = predict(params, images, image_hw, score_threshold=0.05)
    total = float(det.scores.sum())  # host fetch forces full execution
    print(f"SURVIVED: B={b} fused predict ran to completion "
          f"(score sum {total:.3f}) — fault not present on this toolchain")


if __name__ == "__main__":
    main()
