"""NMS tests: the blocked fixed-shape NMS must match greedy (torchvision)
semantics exactly on random inputs, including padded/invalid boxes."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import nms as nms_ops


def random_boxes(rng, n, spread=200.0):
    cy = rng.uniform(0, spread, n)
    cx = rng.uniform(0, spread, n)
    h = rng.uniform(10, 80, n)
    w = rng.uniform(10, 80, n)
    return np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1).astype(
        np.float32
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k,block", [(64, 16), (200, 64), (515, 128)])
def test_nms_matches_greedy_oracle(seed, k, block):
    rng = np.random.default_rng(seed)
    boxes = random_boxes(rng, k)
    scores = rng.uniform(0.01, 1.0, k).astype(np.float32)
    valid = (rng.uniform(size=k) > 0.1).astype(np.float32)

    expected = nms_ops.nms_reference_numpy(
        boxes[valid > 0], scores[valid > 0], iou_threshold=0.5
    )
    exp_idx = np.where(valid > 0)[0][expected]

    max_out = k
    res = nms_ops.nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(valid),
        iou_threshold=0.5,
        max_outputs=max_out,
        block_size=block,
    )
    n_kept = int(np.asarray(res.valid).sum())
    assert n_kept == len(exp_idx)
    np.testing.assert_allclose(
        np.asarray(res.boxes)[:n_kept], boxes[exp_idx], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(res.scores)[:n_kept], scores[exp_idx], rtol=1e-6
    )


def test_nms_max_outputs_truncation():
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 100, spread=10000.0)  # no overlaps: all kept
    scores = rng.uniform(0.01, 1.0, 100).astype(np.float32)
    res = nms_ops.nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.ones(100),
        iou_threshold=0.5,
        max_outputs=10,
    )
    assert np.asarray(res.valid).sum() == 10
    # Top-10 scores in descending order.
    np.testing.assert_allclose(
        np.asarray(res.scores), np.sort(scores)[::-1][:10], rtol=1e-6
    )


def test_nms_all_invalid():
    boxes = jnp.zeros((32, 4))
    res = nms_ops.nms(
        boxes, jnp.zeros(32), jnp.zeros(32), iou_threshold=0.5, max_outputs=8
    )
    assert np.asarray(res.valid).sum() == 0


def test_nms_identical_boxes_keep_one():
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 10.0, 10.0]]), (16, 1))
    scores = jnp.linspace(0.1, 0.9, 16)
    res = nms_ops.nms(
        boxes, scores, jnp.ones(16), iou_threshold=0.5, max_outputs=16
    )
    assert np.asarray(res.valid).sum() == 1
    np.testing.assert_allclose(float(np.asarray(res.scores)[0]), 0.9, rtol=1e-6)


def test_nms_presorted_matches_sorted_path():
    """presorted=True on descending-score input (with invalid entries
    interspersed, as after the RPN size filter) must match the sorting path.
    (The Pallas branch shares this pre-kernel code path.)"""
    rng = np.random.default_rng(7)
    k = 256
    boxes = random_boxes(rng, k)
    scores = np.sort(rng.uniform(0.01, 1.0, k).astype(np.float32))[::-1].copy()
    valid = (rng.uniform(size=k) > 0.2).astype(np.float32)
    kw = dict(iou_threshold=0.5, max_outputs=64)
    a = nms_ops.nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), **kw)
    b = nms_ops.nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        presorted=True, **kw,
    )
    np.testing.assert_allclose(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_allclose(np.asarray(a.boxes), np.asarray(b.boxes), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores), rtol=1e-6)
