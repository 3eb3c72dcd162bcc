"""Region Proposal Network: head module + fixed-shape proposal generation.

Capability parity with reference pytorch/FasterRCNN/models/rpn.py:29-173 and
tf2 rpn.py:53-155, TPU-first:

  * The head is the same tiny conv stack (3x3 + two 1x1 siblings, single
    sigmoid objectness logit per anchor, rpn.py:11-15,37-49; N(0,0.01) init).
  * Proposal generation — the reference's score/sort/clip/filter/NMS pipeline
    over dynamic shapes (rpn.py:118-153) — becomes a fixed-K program:
    top_k at static K_pre, masked size filter, blocked NMS at static K_post.
    Nothing leaves the device and everything batches via vmap.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fasterrcnn_tpu.ops import boxes as box_ops
from fasterrcnn_tpu.ops import nms as nms_ops


class RPNHead(nn.Module):
    """(B, H, W, C) feature map -> objectness logits (B, H, W, 9) and box
    deltas (B, H, W, 9*4)."""

    num_anchors: int = 9
    dtype: str = "float32"

    @nn.compact
    def __call__(self, feature_map: jnp.ndarray):
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        init = nn.initializers.normal(stddev=0.01)
        x = nn.Conv(
            feature_map.shape[-1],
            (3, 3),
            padding="SAME",
            kernel_init=init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(feature_map)
        x = nn.relu(x)
        logits = nn.Conv(
            self.num_anchors,
            (1, 1),
            kernel_init=init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="objectness",
        )(x)
        deltas = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            kernel_init=init,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="deltas",
        )(x)
        # Scores/deltas feed geometry and losses: promote to f32 once here.
        return logits.astype(jnp.float32), deltas.astype(jnp.float32)


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (K_post, 4) corner boxes, score-ordered
    scores: jnp.ndarray  # (K_post,)
    valid: jnp.ndarray  # (K_post,) 1.0 = real proposal


def generate_proposals(
    objectness_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchor_centers: jnp.ndarray,
    proposal_mask: jnp.ndarray,
    image_height,
    image_width,
    pre_nms_top_k: int,
    post_nms_top_k: int,
    nms_iou_threshold: float = 0.7,
    min_side: float = 16.0,
    use_pallas: bool = False,
) -> Proposals:
    """Single-image fixed-shape proposal generation (vmap over batch).

    Args:
      objectness_logits: (A,) raw logits, flattened (y, x, anchor) order.
      box_deltas: (A, 4) predicted (ty, tx, th, tw).
      anchor_centers: (A, 4) anchors in center format (compile-time constant).
      proposal_mask: (A,) anchors eligible to produce proposals. With
        allow_edge_proposals (reference default, faster_rcnn.py:36) this is
        the exists-mask; otherwise exists & valid (rpn.py:167-173).
      image_height/width: real image extent (clip target, rpn.py:135-137).
      pre_nms_top_k / post_nms_top_k: static caps (train 12000/2000, infer
        6000/300; faster_rcnn.py:124-125,302-303).

    Returns score-ordered padded proposals.
    """
    a = objectness_logits.shape[0]
    k_pre = min(pre_nms_top_k, a)

    scores = jnp.where(proposal_mask > 0, objectness_logits, nms_ops.NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k_pre)

    # Decode only the surviving K_pre anchors (reference decodes all A first,
    # rpn.py:118-123; decoding after top_k saves A/K_pre of the work).
    deltas = box_deltas[top_idx]
    anchors = anchor_centers[top_idx]
    boxes = box_ops.decode_deltas(deltas, anchors)
    boxes = box_ops.clip_to_image(boxes, image_height, image_width)

    # Size filter as a mask (rpn.py:139-144 drops; we mask).
    heights = boxes[:, 2] - boxes[:, 0]
    widths = boxes[:, 3] - boxes[:, 1]
    size_ok = (heights >= min_side) & (widths >= min_side)
    valid = (top_scores > nms_ops.NEG_INF) & size_ok

    result = nms_ops.nms(
        boxes,
        top_scores,
        valid,
        iou_threshold=nms_iou_threshold,
        max_outputs=post_nms_top_k,
        use_pallas=use_pallas,
        # top_k already emitted descending scores; skip nms()'s O(K log K)
        # re-sort (the size filter only flips validity, not order).
        presorted=True,
    )
    # NMS scores are logits; proposals are consumed as boxes + validity only,
    # but return sigmoid scores for parity with the reference's outputs.
    return Proposals(
        boxes=result.boxes,
        scores=jax.nn.sigmoid(result.scores) * result.valid,
        valid=result.valid,
    )
