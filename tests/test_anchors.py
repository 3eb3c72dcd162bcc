"""Golden tests: anchor grid + RPN ground-truth assignment vs the reference.

The reference's anchor code (pytorch/FasterRCNN/models/anchors.py) is pure
NumPy, so we run it directly on tiny/medium inputs and assert our TPU-side
implementation produces identical labels and targets. This is the layer the
reference author identified as the main source of mAP bugs (README.md:214-229).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.config import AnchorConfig
from fasterrcnn_tpu.ops import anchors as anchor_ops
from tests.conftest import import_reference

ref_anchors = import_reference("pytorch.FasterRCNN.models.anchors")


@dataclasses.dataclass
class FakeBox:
    class_index: int
    class_name: str
    corners: np.ndarray


def make_gt_boxes(rng, num, height, width):
    out = []
    for _ in range(num):
        y1 = rng.uniform(0, height * 0.7)
        x1 = rng.uniform(0, width * 0.7)
        y2 = y1 + rng.uniform(20, height * 0.3)
        x2 = x1 + rng.uniform(20, width * 0.3)
        out.append(
            FakeBox(
                class_index=int(rng.integers(1, 21)),
                class_name="x",
                corners=np.array([y1, x1, y2, x2], dtype=np.float32),
            )
        )
    return out


def pad_gt(gt_boxes, max_boxes=16):
    corners = np.zeros((max_boxes, 4), np.float32)
    mask = np.zeros((max_boxes,), np.float32)
    for i, b in enumerate(gt_boxes):
        corners[i] = b.corners
        mask[i] = 1.0
    return corners, mask


def test_anchor_sizes_match_paper():
    sizes = anchor_ops.anchor_sizes(AnchorConfig())
    assert sizes.shape == (9, 2)
    areas = sizes[:, 0] * sizes[:, 1]
    np.testing.assert_allclose(
        areas, np.repeat([128**2, 256**2, 512**2], 3), rtol=1e-6
    )
    # Aspect (h/w) cycles through 0.5, 1, 2.
    np.testing.assert_allclose(sizes[:, 0] / sizes[:, 1], [0.5, 1, 2] * 3, rtol=1e-6)


@pytest.mark.skipif(ref_anchors is None, reason="reference tree unavailable")
@pytest.mark.parametrize("image_hw", [(600, 800), (608, 800), (600, 1000)])
def test_anchor_grid_golden(image_hw):
    h, w = image_hw
    fm_h, fm_w = h // 16, w // 16
    ref_map, ref_valid = ref_anchors.generate_anchor_maps(
        image_shape=(3, h, w), feature_map_shape=(512, fm_h, fm_w), feature_pixels=16
    )
    grid = anchor_ops.generate_anchor_grid(fm_h, fm_w)
    np.testing.assert_array_equal(grid.centers, ref_map.reshape(-1, 4))
    valid = np.asarray(
        anchor_ops.anchor_validity(jnp.asarray(grid.corners), float(h), float(w))
    )
    np.testing.assert_array_equal(valid.astype(np.float32), ref_valid.reshape(-1))


@pytest.mark.skipif(ref_anchors is None, reason="reference tree unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_rpn_targets_golden(seed):
    h, w = 608, 800
    fm_h, fm_w = h // 16, w // 16
    rng = np.random.default_rng(seed)
    gt_boxes = make_gt_boxes(rng, num=int(rng.integers(1, 8)), height=h, width=w)

    ref_map, ref_valid = ref_anchors.generate_anchor_maps(
        image_shape=(3, h, w), feature_map_shape=(512, fm_h, fm_w), feature_pixels=16
    )
    ref_rpn, ref_obj_idx, ref_bg_idx = ref_anchors.generate_rpn_map(
        anchor_map=ref_map, anchor_valid_map=ref_valid, gt_boxes=gt_boxes
    )

    grid = anchor_ops.generate_anchor_grid(fm_h, fm_w)
    valid = anchor_ops.anchor_validity(jnp.asarray(grid.corners), float(h), float(w))
    gt_corners, gt_mask = pad_gt(gt_boxes)
    targets = anchor_ops.generate_rpn_targets(
        jnp.asarray(grid.centers),
        jnp.asarray(grid.corners),
        valid,
        jnp.asarray(gt_corners),
        jnp.asarray(gt_mask),
    )
    got_map = anchor_ops.rpn_map_from_flat(grid, targets)

    # The reference assigns labels from float64 IoUs (its corner recomputation
    # upcasts, anchors.py:193-195); the on-device path is float32. Exclude
    # anchors whose label decision sits within an epsilon of a threshold or of
    # a forced-positive tie — those can flip on the last ULP — and require
    # exact agreement everywhere else.
    import pytorch.FasterRCNN.models.math_utils as ref_math

    ref_corners = np.empty(ref_map.reshape(-1, 4).shape)  # float64
    flat_centers = ref_map.reshape(-1, 4)
    ref_corners[:, 0:2] = flat_centers[:, 0:2] - 0.5 * flat_centers[:, 2:4]
    ref_corners[:, 2:4] = flat_centers[:, 0:2] + 0.5 * flat_centers[:, 2:4]
    ious = ref_math.intersection_over_union(
        boxes1=ref_corners, boxes2=np.array([b.corners for b in gt_boxes])
    )
    ious[ref_valid.reshape(-1) == 0, :] = -1.0
    max_iou = ious.max(axis=1)
    eps = 1e-5
    near_thr = (np.abs(max_iou - 0.3) < eps) | (np.abs(max_iou - 0.7) < eps)
    near_tie = np.any(np.abs(ious - ious.max(axis=0)[None, :]) < eps, axis=1)
    decided = ~(near_thr | near_tie).reshape(fm_h, fm_w, grid.num_anchors_per_cell)

    np.testing.assert_array_equal(
        got_map[:, :, :, 0][decided], ref_rpn[:, :, :, 0][decided]
    )
    np.testing.assert_array_equal(
        got_map[:, :, :, 1][decided], ref_rpn[:, :, :, 1][decided]
    )
    assert decided.mean() > 0.995  # boundary cases must stay vanishingly rare
    # Regression targets only compared where they are used (trainable objects).
    used = (ref_rpn[:, :, :, 0] > 0) & (ref_rpn[:, :, :, 1] > 0) & decided
    np.testing.assert_allclose(
        got_map[used][:, 2:6], ref_rpn[used][:, 2:6], rtol=1e-4, atol=1e-5
    )
    # Positive-anchor sets agree up to boundary cases.
    got_pos = int(((got_map[:, :, :, 0] > 0) & (got_map[:, :, :, 1] > 0)).sum())
    assert abs(got_pos - len(ref_obj_idx)) <= int((~decided).sum())


def test_rpn_targets_padding_invariance():
    """Adding canvas padding (larger grid, exists-mask) must not change labels
    for anchors over the real image region."""
    h, w = 600, 800
    fm_h, fm_w = h // 16, w // 16
    rng = np.random.default_rng(7)
    gt_boxes = make_gt_boxes(rng, 5, h, w)
    gt_corners, gt_mask = pad_gt(gt_boxes)

    def run(fm_hp, fm_wp):
        grid = anchor_ops.generate_anchor_grid(fm_hp, fm_wp)
        valid = anchor_ops.anchor_validity(jnp.asarray(grid.corners), float(h), float(w))
        exists = anchor_ops.anchor_exists(grid, fm_h, fm_w)
        t = anchor_ops.generate_rpn_targets(
            jnp.asarray(grid.centers),
            jnp.asarray(grid.corners),
            valid & exists,
            jnp.asarray(gt_corners),
            jnp.asarray(gt_mask),
        )
        k = grid.num_anchors_per_cell
        tr = np.asarray(t.trainable).reshape(fm_hp, fm_wp, k)[:fm_h, :fm_w]
        ob = np.asarray(t.objectness).reshape(fm_hp, fm_wp, k)[:fm_h, :fm_w]
        return tr, ob

    tr_a, ob_a = run(fm_h, fm_w)
    tr_b, ob_b = run(fm_h + 3, fm_w + 5)
    np.testing.assert_array_equal(tr_a, tr_b)
    np.testing.assert_array_equal(ob_a, ob_b)


def test_anchor_exists_mask():
    grid = anchor_ops.generate_anchor_grid(10, 12)
    exists = np.asarray(anchor_ops.anchor_exists(grid, 7, 9)).reshape(10, 12, 9)
    assert exists[:7, :9].all()
    assert not exists[7:].any()
    assert not exists[:, 9:].any()
