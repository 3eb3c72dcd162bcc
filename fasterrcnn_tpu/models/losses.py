"""The four Faster R-CNN losses, fixed-shape/masked.

Numerical semantics match the reference exactly (verified in
tests/test_losses.py against re-derived NumPy formulas):

  * RPN class loss: masked binary cross-entropy over the sampled anchor
    minibatch, / N_cls (reference rpn.py:176-214). Computed from logits
    (stable log-sigmoid) instead of the reference's probabilities + epsilon.
  * RPN regression loss: smooth-L1 with sigma=3, positives only, / N_cls
    (rpn.py:216-272).
  * Detector class loss: softmax cross-entropy / num sampled proposals
    (detector.py:83-104).
  * Detector regression loss: smooth-L1 sigma=1 over the target class's 4
    deltas only, / num sampled proposals (detector.py:106-155). Instead of
    the reference's (N, 2, 4*(C-1)) tiled mask+target layout, the predicted
    deltas are gathered at the target class — mathematically identical and
    O(C) less memory traffic.

All losses are per-image; batched callers take the mean over images,
which reduces to the reference at batch size 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # matches reference loss epsilons (rpn.py:194, detector.py:99)


def smooth_l1(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Robust L1 (Fast R-CNN eq. 3), elementwise."""
    sigma_sq = sigma * sigma
    x_abs = jnp.abs(x)
    quadratic = 0.5 * x * x * sigma_sq
    linear = x_abs - 0.5 / sigma_sq
    return jnp.where(x_abs < 1.0 / sigma_sq, quadratic, linear)


def rpn_class_loss(
    objectness_logits: jnp.ndarray,
    gt_objectness: jnp.ndarray,
    minibatch_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked BCE over the sampled minibatch, normalized by its size.

    Args are flat (A,): raw logits, 0/1 labels, 0/1 selection mask.
    """
    n_cls = jnp.sum(minibatch_mask) + EPSILON
    # BCE from logits: max(z,0) - z*y + log(1+exp(-|z|)).
    z = objectness_logits
    per_anchor = (
        jnp.maximum(z, 0.0) - z * gt_objectness + jnp.log1p(jnp.exp(-jnp.abs(z)))
    )
    return jnp.sum(per_anchor * minibatch_mask) / n_cls


def rpn_regression_loss(
    predicted_deltas: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    gt_objectness: jnp.ndarray,
    minibatch_mask: jnp.ndarray,
    sigma: float = 3.0,
) -> jnp.ndarray:
    """Smooth-L1 over positive minibatch anchors, / N_cls (rpn.py:216-272).

    predicted_deltas/gt_deltas: (A, 4); gt_objectness/minibatch_mask: (A,).
    """
    n_cls = jnp.sum(minibatch_mask) + EPSILON
    weights = (minibatch_mask * gt_objectness)[:, None]
    losses = smooth_l1(gt_deltas - predicted_deltas, sigma)
    return jnp.sum(losses * weights) / n_cls


def detector_class_loss(
    class_logits: jnp.ndarray,
    gt_classes: jnp.ndarray,
    sample_weights: jnp.ndarray,
    sample_count: jnp.ndarray,
) -> jnp.ndarray:
    """Softmax CE over sampled proposals / sample count (detector.py:83-104).

    class_logits: (S, C); gt_classes: (S,) int; sample_weights: (S,) 0/1;
    sample_count: () live-sample count (the reference's N = y_true.shape[0]).
    """
    log_probs = jax.nn.log_softmax(class_logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, gt_classes[:, None], axis=1)[:, 0]
    return -jnp.sum(picked * sample_weights) / (sample_count + EPSILON)


def detector_regression_loss(
    box_deltas: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_deltas: jnp.ndarray,
    sample_weights: jnp.ndarray,
    sample_count: jnp.ndarray,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Smooth-L1 on the target class's deltas / sample count
    (detector.py:106-155).

    box_deltas: (S, 4*(C-1)) predictions; gt_classes: (S,) int (0 = bg);
    gt_deltas: (S, 4) normalized targets.
    """
    s = box_deltas.shape[0]
    per_class = box_deltas.reshape(s, -1, 4)  # (S, C-1, 4)
    # Class c>0 regresses slot c-1; background rows gather slot 0 and are
    # masked out by the positive weight below.
    slot = jnp.maximum(gt_classes - 1, 0)
    picked = jnp.take_along_axis(per_class, slot[:, None, None].repeat(4, 2), axis=1)[
        :, 0, :
    ]
    positive = (gt_classes > 0).astype(jnp.float32) * sample_weights
    losses = smooth_l1(gt_deltas - picked, sigma)
    return jnp.sum(losses * positive[:, None]) / (sample_count + EPSILON)
