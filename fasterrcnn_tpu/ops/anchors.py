"""Anchor grid generation and RPN ground-truth assignment.

TPU-first re-design of reference anchors.py (pytorch/FasterRCNN/models/
anchors.py:25-262). Differences from the reference, by design:

  * The anchor grid is generated once per *canvas bucket* (static shape) and
    is a compile-time constant; the real image occupies the top-left corner
    of the canvas. Anchors over padding are masked by an "exists" mask
    computed at runtime from the real image size, so one compiled program
    serves every image in the bucket.
  * Ground-truth assignment (reference generate_rpn_map, anchors.py:137-262)
    runs **on device inside the jit-compiled train step** over padded
    ground-truth boxes, instead of per-sample NumPy on the host. The host
    data pipeline therefore only decodes/resizes images.
  * Labels are flat (A,) arrays rather than the reference's
    (H, W, 9, 6) map; `rpn_map_from_flat` reshapes for visualization parity.

Numerical semantics (IoU thresholds, forced best-anchor positives, f32
discipline) match the reference exactly; see tests/test_anchors.py for golden
tests against the reference NumPy implementation.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from fasterrcnn_tpu.config import AnchorConfig
from fasterrcnn_tpu.ops import boxes as box_ops


def anchor_sizes(cfg: AnchorConfig = AnchorConfig()) -> np.ndarray:
    """(num_anchors, 2) array of (height, width) anchor sizes in pixels.

    Same parameterization as reference _compute_anchor_sizes (anchors.py:25-41):
    for area a and x-aspect r, width = sqrt(a / r), height = r * width.
    """
    sizes = []
    for area in cfg.areas:
        for r in cfg.aspect_ratios:
            w = math.sqrt(area / r)
            sizes.append((r * w, w))
    return np.array(sizes, dtype=np.float64)


class AnchorGrid(NamedTuple):
    """Static per-canvas anchor constants (A = fm_height * fm_width * 9)."""

    centers: np.ndarray  # (A, 4) float32, (cy, cx, h, w) in image pixels
    corners: np.ndarray  # (A, 4) float32, (y1, x1, y2, x2)
    fm_height: int
    fm_width: int
    num_anchors_per_cell: int

    @property
    def total(self) -> int:
        return self.fm_height * self.fm_width * self.num_anchors_per_cell


@functools.lru_cache(maxsize=64)
def generate_anchor_grid(
    fm_height: int, fm_width: int, cfg: AnchorConfig = AnchorConfig()
) -> AnchorGrid:
    """Build the full anchor set for a feature map of the given static shape.

    Anchors are centered at ((i + 0.5) * stride, (j + 0.5) * stride) like the
    reference (anchors.py:105). Precision discipline matters for label parity
    (anchors.py:76-85): centers are rounded to f32 before the f64 template is
    added, then the result is rounded to f32 — reproduced here bit-for-bit.
    """
    sizes = anchor_sizes(cfg)  # (k, 2) float64
    k = sizes.shape[0]
    stride = float(cfg.feature_pixels)

    ys = (np.arange(fm_height, dtype=np.float64) + 0.5) * stride
    xs = (np.arange(fm_width, dtype=np.float64) + 0.5) * stride
    cy, cx = np.meshgrid(ys, xs, indexing="ij")  # (H, W)
    centers_yx = np.stack([cy, cx], axis=-1).astype(np.float32)  # f32 rounding first
    centers_yx = centers_yx[:, :, None, :].astype(np.float64)  # (H, W, 1, 2)

    half = 0.5 * sizes  # (k, 2) f64
    y1x1 = centers_yx - half[None, None, :, :]
    y2x2 = centers_yx + half[None, None, :, :]
    corners64 = np.concatenate([y1x1, y2x2], axis=-1).reshape(-1, 4)  # f64

    centers64 = np.empty_like(corners64)
    centers64[:, 0:2] = 0.5 * (corners64[:, 0:2] + corners64[:, 2:4])
    centers64[:, 2:4] = corners64[:, 2:4] - corners64[:, 0:2]

    return AnchorGrid(
        centers=centers64.astype(np.float32),
        corners=corners64.astype(np.float32),
        fm_height=fm_height,
        fm_width=fm_width,
        num_anchors_per_cell=k,
    )


def anchor_validity(corners: jnp.ndarray, image_height, image_width) -> jnp.ndarray:
    """(A,) bool: anchor lies fully inside the real image (anchors.py:123-125)."""
    return (
        (corners[:, 0] >= 0.0)
        & (corners[:, 1] >= 0.0)
        & (corners[:, 2] <= image_height)
        & (corners[:, 3] <= image_width)
    )


def anchor_exists(
    grid: AnchorGrid, real_fm_height, real_fm_width
) -> jnp.ndarray:
    """(A,) bool: anchor's cell lies inside the *real* (unpadded) feature grid.

    The reference has no padding so every anchor exists; here, cells over
    canvas padding must be excluded from both training and proposals.
    """
    cell_y = jnp.arange(grid.total, dtype=jnp.int32) // (
        grid.fm_width * grid.num_anchors_per_cell
    )
    cell_x = (
        jnp.arange(grid.total, dtype=jnp.int32) // grid.num_anchors_per_cell
    ) % grid.fm_width
    return (cell_y < real_fm_height) & (cell_x < real_fm_width)


class RPNTargets(NamedTuple):
    trainable: jnp.ndarray  # (A,) f32: 1 if anchor is a definite pos/neg sample
    objectness: jnp.ndarray  # (A,) f32: 1 = object, 0 = background/ignored
    deltas: jnp.ndarray  # (A, 4) f32: (ty, tx, th, tw) vs assigned gt box


def generate_rpn_targets(
    anchor_centers: jnp.ndarray,
    anchor_corners: jnp.ndarray,
    anchor_valid: jnp.ndarray,
    gt_corners: jnp.ndarray,
    gt_mask: jnp.ndarray,
    object_iou_threshold: float = 0.7,
    background_iou_threshold: float = 0.3,
) -> RPNTargets:
    """On-device RPN ground-truth assignment over padded gt boxes.

    Matches reference generate_rpn_map (anchors.py:137-262):
      * anchors crossing image bounds are excluded (IoU forced to -1),
      * IoU < bg_thr => background; IoU >= obj_thr => object,
      * for every gt box, all anchors tying its best IoU are forced positive,
      * each anchor regresses to its highest-IoU gt box.

    gt_corners is (G, 4) padded; gt_mask is (G,) with 1 for real boxes.
    """
    anchor_valid = anchor_valid.astype(bool)
    gt_real = gt_mask.astype(bool)  # (G,)

    ious = box_ops.iou_matrix(anchor_corners, gt_corners)  # (A, G) f32
    # Invalid anchors out of consideration entirely (anchors.py:209). Padded gt
    # columns get a distinct lower sentinel so they never win an argmax and
    # never participate in the forced-positive tie test.
    ious = jnp.where(anchor_valid[:, None], ious, -1.0)
    ious = jnp.where(gt_real[None, :], ious, -2.0)

    max_iou_per_anchor = jnp.max(ious, axis=1)  # (A,)
    best_gt_per_anchor = jnp.argmax(ious, axis=1)  # (A,)
    max_iou_per_gt = jnp.max(ious, axis=0)  # (G,)
    # Forced positives: anchors achieving the per-gt max IoU (anchors.py:222,231).
    # The reference's equality test is reproduced verbatim (including its
    # degenerate behavior when a gt box overlaps nothing), limited to real gt.
    forced = jnp.any((ious == max_iou_per_gt[None, :]) & gt_real[None, :], axis=1)
    forced = forced & anchor_valid

    label = jnp.full(max_iou_per_anchor.shape, -1, dtype=jnp.int32)
    label = jnp.where(max_iou_per_anchor < background_iou_threshold, 0, label)
    label = jnp.where(max_iou_per_anchor >= object_iou_threshold, 1, label)
    label = jnp.where(forced, 1, label)

    trainable = (anchor_valid & (label >= 0)).astype(jnp.float32)
    objectness = (label == 1).astype(jnp.float32)

    assigned = gt_corners[best_gt_per_anchor]  # (A, 4)
    deltas = box_ops.encode_deltas(
        box_ops.corners_to_centers(assigned), anchor_centers
    )
    # Keep deltas finite even for degenerate assignments (masked out in loss).
    deltas = jnp.where(jnp.isfinite(deltas), deltas, 0.0)
    return RPNTargets(trainable=trainable, objectness=objectness, deltas=deltas)


def rpn_map_from_flat(
    grid: AnchorGrid, targets: RPNTargets
) -> np.ndarray:
    """Assemble the reference's (H, W, 9, 6) ground-truth map layout
    (anchors.py:164-175) from flat targets, for visualization and tests."""
    h, w, k = grid.fm_height, grid.fm_width, grid.num_anchors_per_cell
    rpn_map = np.zeros((h, w, k, 6), dtype=np.float32)
    rpn_map[:, :, :, 0] = np.asarray(targets.trainable).reshape(h, w, k)
    rpn_map[:, :, :, 1] = np.asarray(targets.objectness).reshape(h, w, k)
    rpn_map[:, :, :, 2:6] = np.asarray(targets.deltas).reshape(h, w, k, 4)
    return rpn_map


def real_feature_map_size(
    image_height, image_width, feature_pixels: int, ceil_mode: bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-grid extent of the real image: floor division for VGG-16
    (vgg16.py:155-158), ceil for ResNet (resnet.py:161-185)."""
    if ceil_mode:
        fh = -(-image_height // feature_pixels)
        fw = -(-image_width // feature_pixels)
    else:
        fh = image_height // feature_pixels
        fw = image_width // feature_pixels
    return fh, fw
