"""Box geometry in pure jnp: format conversion, IoU, delta encode/decode.

Replaces the four NumPy/torch variants in the reference
(pytorch/FasterRCNN/models/math_utils.py:13,39,65,99 and the tf2 twins) with
one shape-polymorphic jnp module. Boxes are (..., 4) with corner layout
(y1, x1, y2, x2); "center" format is (cy, cx, h, w). Delta parameterization is
(ty, tx, th, tw) from the Fast R-CNN paper.

All functions are jit/vmap-friendly: no data-dependent shapes, float32 math
(the reference found anchor labeling is sensitive to precision,
pytorch/FasterRCNN/models/anchors.py:76-85, so IoU stays in f32 even when the
model computes in bf16).
"""

from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-7  # matches reference math_utils.py:36


def corners_to_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corners (y1,x1,y2,x2) -> centers (cy,cx,h,w)."""
    center = 0.5 * (boxes[..., 0:2] + boxes[..., 2:4])
    size = boxes[..., 2:4] - boxes[..., 0:2]
    return jnp.concatenate([center, size], axis=-1)


def centers_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) centers (cy,cx,h,w) -> corners (y1,x1,y2,x2)."""
    half = 0.5 * boxes[..., 2:4]
    return jnp.concatenate([boxes[..., 0:2] - half, boxes[..., 0:2] + half], axis=-1)


def iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of corner boxes: (N, 4) x (M, 4) -> (N, M).

    Semantics match reference math_utils.intersection_over_union
    (pytorch/FasterRCNN/models/math_utils.py:13-37): strict well-ordering test
    (zero-area intersections count as no overlap) and an epsilon-padded union.
    """
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    top_left = jnp.maximum(boxes1[:, None, 0:2], boxes2[None, :, 0:2])
    bottom_right = jnp.minimum(boxes1[:, None, 2:4], boxes2[None, :, 2:4])
    well_ordered = jnp.all(top_left < bottom_right, axis=2)
    intersection = well_ordered * jnp.prod(bottom_right - top_left, axis=2)
    areas1 = jnp.prod(boxes1[:, 2:4] - boxes1[:, 0:2], axis=1)
    areas2 = jnp.prod(boxes2[:, 2:4] - boxes2[:, 0:2], axis=1)
    union = areas1[:, None] + areas2[None, :] - intersection
    return intersection / (union + EPSILON)


def pairwise_iou_corners(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of two equally-shaped (..., 4) corner box arrays."""
    boxes1 = boxes1.astype(jnp.float32)
    boxes2 = boxes2.astype(jnp.float32)
    top_left = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
    bottom_right = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    well_ordered = jnp.all(top_left < bottom_right, axis=-1)
    intersection = well_ordered * jnp.prod(bottom_right - top_left, axis=-1)
    areas1 = jnp.prod(boxes1[..., 2:4] - boxes1[..., 0:2], axis=-1)
    areas2 = jnp.prod(boxes2[..., 2:4] - boxes2[..., 0:2], axis=-1)
    union = areas1 + areas2 - intersection
    return intersection / (union + EPSILON)


def encode_deltas(gt_centers: jnp.ndarray, anchor_centers: jnp.ndarray) -> jnp.ndarray:
    """Regression targets (ty,tx,th,tw) of gt boxes relative to anchors.

    Both inputs are (..., 4) in center format. Matches the target math in
    reference anchors.py:247-249 and faster_rcnn.py:506-510. Note: no
    mean/std normalization here; callers apply it where the reference does
    (detector targets only, faster_rcnn.py:511-514).
    """
    t_center = (gt_centers[..., 0:2] - anchor_centers[..., 0:2]) / anchor_centers[..., 2:4]
    t_size = jnp.log(gt_centers[..., 2:4] / anchor_centers[..., 2:4])
    return jnp.concatenate([t_center, t_size], axis=-1)


def decode_deltas(
    deltas: jnp.ndarray,
    anchor_centers: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Invert encode_deltas: (..., 4) deltas + anchors (center fmt) -> corners.

    Deltas are first de-normalized (delta * std + mean), matching reference
    math_utils.convert_deltas_to_boxes (math_utils.py:65-97).
    """
    deltas = deltas.astype(jnp.float32) * jnp.asarray(stds, jnp.float32) + jnp.asarray(
        means, jnp.float32
    )
    center = anchor_centers[..., 2:4] * deltas[..., 0:2] + anchor_centers[..., 0:2]
    size = anchor_centers[..., 2:4] * jnp.exp(deltas[..., 2:4])
    return jnp.concatenate([center - 0.5 * size, center + 0.5 * size], axis=-1)


def clip_to_image(boxes: jnp.ndarray, image_height, image_width) -> jnp.ndarray:
    """Clamp corner boxes into [0, H] x [0, W] (RPN-style clipping, rpn.py:135-137)."""
    y1 = jnp.clip(boxes[..., 0], 0.0, image_height)
    x1 = jnp.clip(boxes[..., 1], 0.0, image_width)
    y2 = jnp.clip(boxes[..., 2], 0.0, image_height)
    x2 = jnp.clip(boxes[..., 3], 0.0, image_width)
    return jnp.stack([y1, x1, y2, x2], axis=-1)
