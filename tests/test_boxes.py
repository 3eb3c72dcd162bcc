"""Geometry core tests: IoU, format conversion, delta encode/decode."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import boxes as box_ops
from tests.conftest import import_reference

ref_math = import_reference("pytorch.FasterRCNN.models.math_utils")


def random_corner_boxes(rng, n, height=600, width=800):
    y1 = rng.uniform(0, height * 0.9, n)
    x1 = rng.uniform(0, width * 0.9, n)
    y2 = y1 + rng.uniform(1, height * 0.5, n)
    x2 = x1 + rng.uniform(1, width * 0.5, n)
    return np.stack([y1, x1, y2, x2], axis=1).astype(np.float32)


def test_iou_matrix_basic():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = box_ops.iou_matrix(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, atol=1e-5)
    np.testing.assert_allclose(iou[0, 2], 0.0, atol=1e-7)


def test_iou_touching_boxes_is_zero():
    # Strict well-ordering: boxes sharing only an edge have zero IoU.
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[10.0, 0.0, 20.0, 10.0]])
    assert float(box_ops.iou_matrix(a, b)[0, 0]) == 0.0


@pytest.mark.skipif(ref_math is None, reason="reference tree unavailable")
def test_iou_matrix_golden_vs_reference():
    rng = np.random.default_rng(0)
    b1 = random_corner_boxes(rng, 200)
    b2 = random_corner_boxes(rng, 37)
    expected = ref_math.intersection_over_union(boxes1=b1, boxes2=b2)
    got = np.asarray(box_ops.iou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_corners_centers_roundtrip():
    rng = np.random.default_rng(1)
    boxes = random_corner_boxes(rng, 50)
    centers = box_ops.corners_to_centers(jnp.asarray(boxes))
    back = box_ops.centers_to_corners(centers)
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-5, atol=1e-3)


def test_delta_encode_decode_roundtrip():
    rng = np.random.default_rng(2)
    anchors = box_ops.corners_to_centers(jnp.asarray(random_corner_boxes(rng, 64)))
    gt = random_corner_boxes(rng, 64)
    deltas = box_ops.encode_deltas(box_ops.corners_to_centers(jnp.asarray(gt)), anchors)
    decoded = box_ops.decode_deltas(deltas, anchors)
    np.testing.assert_allclose(np.asarray(decoded), gt, rtol=1e-4, atol=1e-2)


@pytest.mark.skipif(ref_math is None, reason="reference tree unavailable")
def test_decode_deltas_golden_vs_reference():
    rng = np.random.default_rng(3)
    anchors_c = np.asarray(
        box_ops.corners_to_centers(jnp.asarray(random_corner_boxes(rng, 128)))
    )
    deltas = rng.normal(0, 1.0, (128, 4)).astype(np.float32)
    means = np.array([0.0, 0.0, 0.0, 0.0], np.float32)
    stds = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
    expected = ref_math.convert_deltas_to_boxes(
        box_deltas=deltas, anchors=anchors_c, box_delta_means=means, box_delta_stds=stds
    )
    got = np.asarray(
        box_ops.decode_deltas(jnp.asarray(deltas), jnp.asarray(anchors_c), means, stds)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)


def test_clip_to_image():
    boxes = jnp.array([[-5.0, -3.0, 700.0, 900.0], [10.0, 10.0, 20.0, 20.0]])
    clipped = box_ops.clip_to_image(boxes, 600.0, 800.0)
    np.testing.assert_allclose(
        np.asarray(clipped), [[0, 0, 600, 800], [10, 10, 20, 20]], atol=1e-6
    )
