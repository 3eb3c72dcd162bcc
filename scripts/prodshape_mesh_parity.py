#!/usr/bin/env python
"""Execute ONE production-shape train step on a virtual 8-device mesh and
prove it matches the single-device step.

Closes the gap left by the compile-only oracle
(tests/test_mesh.py::test_production_shape_compiles_on_mesh, which AOT-lowers
the 608x800 program but never runs it) and by dryrun_multichip (which runs
parity at 64x96 toy shapes): here the REAL production program — the packed
train step at the full 608x800 canvas, bs=8, full anchor pyramid and
12000->2000 proposal caps — executes on a (dp=4, tp=2) CPU mesh and on one
device, and the per-step loss vector and updated parameters are compared.

Run (takes minutes: production-shape VGG fwd+bwd on 1 CPU core):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/prodshape_mesh_parity.py
Prints one JSON line; exits nonzero on mismatch. f32 compute (the CPU
backend's native dtype; the program structure — shardings, collectives,
donation — is dtype-independent).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# 8 virtual devices time-share this host's core(s); at production shapes a
# device's pre-collective compute takes minutes, far beyond XLA:CPU's
# default 40 s all-reduce rendezvous termination timeout (rendezvous.cc
# aborts the process). Stretch both rendezvous knobs.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # (warn_stuck_seconds exists in DebugOptions but is not registered with
    # this jaxlib's XLA_FLAGS parser; the two below are.)
    _flags += (
        " --xla_cpu_collective_timeout_seconds=7200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    )
os.environ["XLA_FLAGS"] = _flags.strip()


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fasterrcnn_tpu.config import ModelConfig, TrainConfig
    from fasterrcnn_tpu.engine import make_optimizer
    from fasterrcnn_tpu.models.faster_rcnn import (
        FasterRCNN,
        init_params,
        make_train_step_packed,
        pack_aux,
    )
    from fasterrcnn_tpu.parallel import mesh as mesh_lib

    assert jax.device_count() >= 8, jax.devices()

    cfg = ModelConfig(backbone="vgg16")  # FULL production config
    model = FasterRCNN(cfg=cfg)
    canvas_h, canvas_w = 608, 800
    b = 8
    mesh = mesh_lib.make_mesh(8, tp=2)

    rng = np.random.default_rng(0)

    class _HB:  # host batch in the packed step's layout
        images = rng.integers(0, 255, (b, canvas_h, canvas_w, 3), dtype=np.uint8)
        image_hw = np.tile([[600.0, 800.0]], (b, 1)).astype(np.float32)
        gt_boxes = np.zeros((b, cfg.max_gt_boxes, 4), np.float32)
        gt_classes = np.zeros((b, cfg.max_gt_boxes), np.int32)
        gt_mask = np.zeros((b, cfg.max_gt_boxes), np.float32)
        sample_weight = np.ones((b,), np.float32)

    for i in range(b):
        for j in range(3):
            y1, x1 = rng.uniform(0, 400), rng.uniform(0, 500)
            _HB.gt_boxes[i, j] = [y1, x1, y1 + rng.uniform(60, 180), x1 + rng.uniform(60, 250)]
            _HB.gt_classes[i, j] = rng.integers(1, 21)
            _HB.gt_mask[i, j] = 1.0

    tx, _ = make_optimizer(cfg, TrainConfig(), init_params(model, canvas_h, canvas_w, seed=0))
    packed = make_train_step_packed(model, tx, canvas_h, canvas_w)
    aux = jnp.asarray(pack_aux(_HB, 5))
    images = jnp.asarray(_HB.images)

    def fresh():
        p = init_params(model, canvas_h, canvas_w, seed=0)
        return p, tx.init(init_params(model, canvas_h, canvas_w, seed=0))

    t0 = time.time()
    p_shard = mesh_lib.param_shardings(mesh, init_params(model, canvas_h, canvas_w, seed=0))
    pm, om = fresh()
    pm = jax.device_put(pm, p_shard)
    im, am = jax.device_put((images, aux), mesh_lib.batch_shardings(mesh, (images, aux)))
    with jax.sharding.set_mesh(mesh):
        pm, om, _, vec_mesh = packed(pm, om, im, am, jax.random.key(0))
        vec_mesh = np.asarray(vec_mesh)
        pm = jax.tree.map(np.asarray, pm)
    t_mesh = time.time() - t0

    t0 = time.time()
    one = jax.devices()[0]
    p1, o1 = fresh()
    p1, o1, _, vec_one = packed(
        jax.device_put(p1, one),
        o1,
        jax.device_put(images, one),
        jax.device_put(aux, one),
        jax.device_put(jax.random.key(0), one),
    )
    vec_one = np.asarray(vec_one)
    t_one = time.time() - t0

    dloss = float(np.max(np.abs(vec_mesh - vec_one)))
    dparams = max(
        float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(c, np.float32))))
        for a, c in zip(jax.tree.leaves(pm), jax.tree.leaves(p1))
    )
    record = {
        "canvas": f"{canvas_h}x{canvas_w}",
        "batch_size": b,
        "mesh": "dp=4 x tp=2 (8 virtual CPU devices)",
        "program": "make_train_step_packed (production train program), f32",
        "losses_mesh": [round(float(x), 6) for x in vec_mesh],
        "dloss_max": dloss,
        "dparams_max": dparams,
        "ok": bool(dloss < 1e-4 and dparams < 1e-4 and np.isfinite(vec_mesh).all()),
        "step_seconds_mesh": round(t_mesh, 1),
        "step_seconds_single": round(t_one, 1),
    }
    print(json.dumps(record))
    if not record["ok"]:
        raise SystemExit(f"production-shape mesh parity FAILED: {record}")


if __name__ == "__main__":
    main()
