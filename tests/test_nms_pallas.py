"""Pallas NMS kernel vs the XLA blocked oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import nms as nms_ops
from fasterrcnn_tpu.ops.pallas.nms_pallas import nms_keep_mask_pallas


def sorted_random_boxes(rng, k, spread=300.0):
    cy = rng.uniform(0, spread, k)
    cx = rng.uniform(0, spread, k)
    h = rng.uniform(10, 90, k)
    w = rng.uniform(10, 90, k)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1).astype(
        np.float32
    )
    scores = np.sort(rng.uniform(0.01, 1.0, k).astype(np.float32))[::-1].copy()
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [128, 512])
def test_pallas_nms_matches_oracle(seed, k):
    rng = np.random.default_rng(seed)
    boxes, scores = sorted_random_boxes(rng, k)
    valid = (rng.uniform(size=k) > 0.1).astype(np.float32)

    expected = nms_ops.nms_reference_numpy(
        boxes[valid > 0], scores[valid > 0], iou_threshold=0.5
    )
    exp_idx = np.where(valid > 0)[0][expected]
    want = np.zeros(k, np.float32)
    want[exp_idx] = 1.0

    got = np.asarray(
        nms_keep_mask_pallas(
            jnp.asarray(boxes),
            jnp.asarray(valid),
            iou_threshold=0.5,
            max_keep=k,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_early_exit():
    rng = np.random.default_rng(3)
    boxes, scores = sorted_random_boxes(rng, 256, spread=10000.0)  # no overlap
    got = np.asarray(
        nms_keep_mask_pallas(
            jnp.asarray(boxes),
            jnp.ones(256),
            iou_threshold=0.5,
            max_keep=10,
            interpret=True,
        )
    )
    # exactly the first 10 (highest-score prefix) accepted
    assert got.sum() == 10
    np.testing.assert_array_equal(np.where(got > 0)[0], np.arange(10))


def test_pallas_nms_all_invalid():
    boxes = jnp.zeros((128, 4))
    got = np.asarray(
        nms_keep_mask_pallas(
            boxes, jnp.zeros(128), iou_threshold=0.5, max_keep=16, interpret=True
        )
    )
    assert got.sum() == 0


def test_nms_wrapper_pallas_path_matches_xla():
    """ops.nms with use_pallas=True (interpreted) == use_pallas=False."""
    rng = np.random.default_rng(4)
    k = 200  # non-multiple of 128: wrapper must pad
    boxes, _ = sorted_random_boxes(rng, k)
    scores = rng.uniform(0.01, 1.0, k).astype(np.float32)  # unsorted
    valid = np.ones(k, np.float32)

    ref = nms_ops.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.6, max_outputs=64,
    )
    # Patch the kernel to interpret mode for CPU execution.
    import fasterrcnn_tpu.ops.nms as nms_mod
    import fasterrcnn_tpu.ops.pallas.nms_pallas as pk

    orig = pk.nms_keep_mask_pallas
    import functools

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    pk.nms_keep_mask_pallas = interp
    try:
        got = nms_ops.nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            iou_threshold=0.6, max_outputs=64, use_pallas=True,
        )
    finally:
        pk.nms_keep_mask_pallas = orig
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(ref.boxes))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(ref.scores))
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
