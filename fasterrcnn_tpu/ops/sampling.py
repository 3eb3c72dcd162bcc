"""On-device minibatch sampling for RPN anchors and detector proposals.

The reference samples with host RNG over dynamic index lists
(pytorch/FasterRCNN/models/faster_rcnn.py:364-416 `_sample_rpn_minibatch`,
:418-524 `_label_proposals`, :526-561 `_sample_proposals`). Here, everything
is a fixed-shape masked computation driven by `jax.random` keys, so it lives
*inside* the jit-compiled train step:

  * "sample k uniformly without replacement from a masked set" becomes
    "draw one uniform per element, rank within the masked set, keep rank < k"
    — two argsorts, no data-dependent shapes.
  * "return fewer items when the set is small" becomes weight masks that the
    losses consume; slot counts never change.

The reference uses unseeded host RNG, so only distributional parity is
required (SURVEY.md section 7, hard part (e)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasterrcnn_tpu.ops import boxes as box_ops


def _masked_rank(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniform-random rank of each element within the masked subset.

    Elements outside the mask get rank >= |mask|. rank < k selects a uniform
    random k-subset of the masked elements.
    """
    r = jax.random.uniform(key, mask.shape)
    priority = jnp.where(mask, r, 2.0)  # unmasked elements sort last
    order = jnp.argsort(priority)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(mask.shape[0]))
    return ranks


def sample_rpn_minibatch(
    key: jax.Array,
    trainable: jnp.ndarray,
    objectness: jnp.ndarray,
    minibatch_size: int = 256,
    max_positive_fraction: float = 0.5,
) -> jnp.ndarray:
    """Select the RPN training minibatch (reference faster_rcnn.py:364-416).

    Up to half the minibatch is positive anchors (fewer if the image lacks
    them); the remainder is negative. Returns a (A,) float mask — the
    equivalent of channel 0 of the reference's minibatch map.
    """
    pos_mask = (trainable > 0) & (objectness > 0)
    neg_mask = (trainable > 0) & (objectness == 0)
    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)

    max_pos = int(minibatch_size * max_positive_fraction)
    num_pos = jnp.minimum(max_pos, n_pos)
    num_neg = jnp.minimum(minibatch_size - num_pos, n_neg)

    kp, kn = jax.random.split(key)
    sel_pos = pos_mask & (_masked_rank(kp, pos_mask) < num_pos)
    sel_neg = neg_mask & (_masked_rank(kn, neg_mask) < num_neg)
    return (sel_pos | sel_neg).astype(jnp.float32)


class ProposalSamples(NamedTuple):
    """Fixed-size detector training batch (S = proposal_batch_size slots)."""

    boxes: jnp.ndarray  # (S, 4) proposal corners
    classes: jnp.ndarray  # (S,) int32 gt class (0 = background)
    deltas: jnp.ndarray  # (S, 4) normalized regression targets (ty,tx,th,tw)
    weights: jnp.ndarray  # (S,) 1.0 for live samples, 0.0 for padding
    count: jnp.ndarray  # () number of live samples (loss normalizer)


def label_and_sample_proposals(
    key: jax.Array,
    proposals: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    gt_corners: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    batch_size: int = 128,
    positive_fraction: float = 0.25,
    min_object_iou: float = 0.5,
    min_background_iou: float = 0.0,
    delta_means=(0.0, 0.0, 0.0, 0.0),
    delta_stds=(0.1, 0.1, 0.2, 0.2),
) -> ProposalSamples:
    """Label RPN proposals against gt boxes and sample the detector batch.

    Mirrors reference _label_proposals + _sample_proposals
    (faster_rcnn.py:418-561) over padded inputs:
      * gt boxes are injected as extra proposals (guaranteed positives,
        faster_rcnn.py:463-467),
      * best-IoU gt assigns the class; IoU < min_object_iou => background,
      * proposals below min_background_iou are dropped (with the reference
        default of 0.0 and IoU >= 0 this drops nothing — kept for parity),
      * batch = min(batch_size, N) samples with <= positive_fraction
        positives (rounded), random without replacement,
      * if either side is absent the batch is empty (weights all zero,
        faster_rcnn.py:552-553).
    """
    gt_real = gt_mask > 0
    all_boxes = jnp.concatenate([proposals, gt_corners], axis=0)  # (P+G, 4)
    all_valid = jnp.concatenate(
        [proposal_valid.astype(bool), gt_real], axis=0
    )

    ious = box_ops.iou_matrix(all_boxes, gt_corners)  # (P+G, G)
    ious = jnp.where(gt_real[None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=1)
    best_gt = jnp.argmax(ious, axis=1)

    all_valid = all_valid & (best_iou >= min_background_iou)
    label = jnp.where(best_iou >= min_object_iou, gt_classes[best_gt], 0)
    label = jnp.where(all_valid, label, 0).astype(jnp.int32)

    pos_mask = all_valid & (label > 0)
    neg_mask = all_valid & (label == 0)
    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)
    n_all = jnp.sum(all_valid)

    num_samples = jnp.minimum(batch_size, n_all)
    num_pos = jnp.minimum(
        jnp.round(num_samples * positive_fraction).astype(jnp.int32), n_pos
    )
    num_neg = jnp.minimum(num_samples - num_pos, n_neg)
    empty = (num_pos <= 0) | (num_neg <= 0)

    kp, kn, kg = jax.random.split(key, 3)
    sel = (pos_mask & (_masked_rank(kp, pos_mask) < num_pos)) | (
        neg_mask & (_masked_rank(kn, neg_mask) < num_neg)
    )
    sel = sel & ~empty

    # Pack the selected proposals into batch_size slots (selected first).
    pack_priority = sel.astype(jnp.float32)
    k = min(batch_size, sel.shape[0])  # static; inputs may be tiny in tests
    _, slots = jax.lax.top_k(pack_priority, k)
    if k < batch_size:
        slots = jnp.pad(slots, (0, batch_size - k))
        # padded slots point at element 0 but carry sel=False weights
        slot_pad_live = jnp.pad(sel[slots[:k]], (0, batch_size - k))
        slot_live = slot_pad_live
    else:
        slot_live = sel[slots]

    boxes = all_boxes[slots]
    classes = jnp.where(slot_live, label[slots], 0)
    assigned_gt = gt_corners[best_gt[slots]]

    targets = box_ops.encode_deltas(
        box_ops.corners_to_centers(assigned_gt), box_ops.corners_to_centers(boxes)
    )
    targets = (
        targets - jnp.asarray(delta_means, jnp.float32)
    ) / jnp.asarray(delta_stds, jnp.float32)
    targets = jnp.where(jnp.isfinite(targets), targets, 0.0)

    weights = slot_live.astype(jnp.float32)
    count = (num_pos + num_neg) * (1 - empty.astype(jnp.int32))
    return ProposalSamples(
        boxes=jnp.where(slot_live[:, None], boxes, 0.0),
        classes=classes,
        deltas=targets,
        weights=weights,
        count=count,
    )
