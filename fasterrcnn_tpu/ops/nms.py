"""Fixed-shape, on-device non-maximum suppression.

Replaces the reference's library NMS kernels (torchvision.ops.nms at
pytorch/FasterRCNN/models/rpn.py:24,147 and tf.image.non_max_suppression at
tf2/FasterRCNN/models/rpn.py:116) with XLA-friendly implementations:

  * `nms` — exact greedy NMS via a *blocked* algorithm: boxes are sorted by
    score once, then processed in score-ordered blocks. Within a block the
    O(B^2) greedy triangle runs as a short fori_loop of vector ops; each
    finished block then suppresses all lower-scored boxes in one parallel
    (B x K) IoU pass. This is the standard TPU formulation: K/B parallel
    sweeps instead of K fully-sequential steps.
  * A Pallas kernel fast path lives in ops/pallas/nms_pallas.py (same
    semantics, fused in VMEM); `nms` is the oracle it is tested against.

Everything is static-shape: inputs are padded to K boxes with a validity
mask; the result is a keep-mask plus top-`max_outputs` gathered boxes.

Greedy NMS semantics (identical to torchvision): iterate boxes in descending
score order; keep a box iff it does not overlap (IoU > threshold) any
previously *kept* box. Ties in score are broken by input order, matching a
stable descending sort.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasterrcnn_tpu.ops import boxes as box_ops

NEG_INF = -1e30


def _iou_corners(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,4) x (M,4) -> (N,M) IoU, strict well-ordering (math_utils.py:13-37)."""
    return box_ops.iou_matrix(a, b)


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # (max_outputs, 4) selected boxes, score-ordered
    scores: jnp.ndarray  # (max_outputs,)
    valid: jnp.ndarray  # (max_outputs,) 1.0 for real selections, 0 for padding


def default_backend_uses_pallas() -> bool:
    """Pallas NMS fast path on real TPUs; XLA blocked path elsewhere (CPU
    tests, interpreters). Delegates to the per-kernel-family predicate in
    ops.pallas so NMS and RoI backends toggle independently."""
    from fasterrcnn_tpu.ops import pallas as pallas_pkg

    return pallas_pkg.use_nms_kernel()


@functools.partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "max_outputs", "block_size", "use_pallas", "presorted"
    ),
)
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    block_size: int = 256,
    use_pallas: bool = False,
    presorted: bool = False,
) -> NMSResult:
    """Exact greedy NMS over K padded boxes; returns top max_outputs survivors.

    Args:
      boxes: (K, 4) corner boxes (y1, x1, y2, x2).
      scores: (K,) scores; invalid entries are ignored regardless of value.
      valid: (K,) bool/float mask of real boxes.
      iou_threshold: suppression threshold (strictly-greater comparison,
        matching torchvision).
      max_outputs: number of survivors to emit (score-ordered, padded).
      use_pallas: run the suppression scan as the Pallas TPU kernel
        (ops/pallas/nms_pallas.py) instead of the blocked XLA program.
      presorted: promise that valid entries already arrive in descending
        score order (e.g. straight out of jax.lax.top_k), skipping an
        O(K log K) sort; invalid entries may sit anywhere.
    """
    k = boxes.shape[0]
    block_size = min(block_size, k)
    num_blocks = -(-k // block_size)
    pad = num_blocks * block_size - k
    if use_pallas:  # the kernel's state is (R, 128) lane-major
        pad = (-k) % 128
        num_blocks = None

    valid = valid.astype(bool)
    scores = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)

    if presorted:
        sboxes = boxes.astype(jnp.float32)
        sscores = scores
        svalid = valid
    else:
        order = jnp.argsort(-scores)  # stable descending sort
        sboxes = boxes.astype(jnp.float32)[order]
        sscores = scores[order]
        svalid = valid[order]
    if pad:
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        sscores = jnp.pad(sscores, ((0, pad),), constant_values=NEG_INF)
        svalid = jnp.pad(svalid, ((0, pad),))

    kp = sboxes.shape[0]

    if use_pallas:
        from fasterrcnn_tpu.ops.pallas.nms_pallas import nms_keep_mask_pallas

        keep = (
            nms_keep_mask_pallas(
                sboxes, svalid, iou_threshold, max_outputs
            )
            > 0
        )
        return _gather_survivors(sboxes, sscores, keep, max_outputs)

    keep = svalid

    def block_step(blk, keep):
        start = blk * block_size
        rows = jax.lax.dynamic_slice(sboxes, (start, 0), (block_size, 4))
        keep_rows = jax.lax.dynamic_slice(keep, (start,), (block_size,))

        iou_rr = _iou_corners(rows, rows)  # (B, B)
        above = (
            jax.lax.broadcasted_iota(jnp.int32, (block_size, block_size), 0)
            < jax.lax.broadcasted_iota(jnp.int32, (block_size, block_size), 1)
        )  # row i earlier (higher score) than column j
        sup_rr = (iou_rr > iou_threshold) & above

        def inner(i, kr):
            # If row i is still kept, suppress all later rows it overlaps.
            kills = sup_rr[i] & kr[i]
            return kr & ~kills

        keep_rows = jax.lax.fori_loop(0, block_size, inner, keep_rows)

        # One parallel sweep: the block's kept rows suppress all later boxes.
        iou_rt = _iou_corners(rows, sboxes)  # (B, Kp)
        later = jnp.arange(kp) >= (start + block_size)
        killed = jnp.any((iou_rt > iou_threshold) & keep_rows[:, None], axis=0)
        keep = keep & ~(killed & later)
        keep = jax.lax.dynamic_update_slice(keep, keep_rows, (start,))
        return keep

    keep = jax.lax.fori_loop(0, num_blocks, block_step, keep)
    return _gather_survivors(sboxes, sscores, keep, max_outputs)


def _gather_survivors(sboxes, sscores, keep, max_outputs: int) -> NMSResult:
    """First max_outputs kept boxes in score order (inputs score-sorted)."""
    kp = sboxes.shape[0]
    k_out = min(max_outputs, kp)
    priority = jnp.where(keep, jnp.arange(kp, 0, -1, dtype=jnp.int32), 0)
    _, sel = jax.lax.top_k(priority, k_out)
    if k_out < max_outputs:
        sel = jnp.pad(sel, (0, max_outputs - k_out))
        sel_valid = keep[sel] & (jnp.arange(max_outputs) < k_out)
    else:
        sel_valid = keep[sel]
    return NMSResult(
        boxes=jnp.where(sel_valid[:, None], sboxes[sel], 0.0),
        scores=jnp.where(sel_valid, sscores[sel], 0.0),
        valid=sel_valid.astype(jnp.float32),
    )


def nms_reference_numpy(boxes, scores, iou_threshold):
    """Plain-Python greedy NMS oracle (torchvision semantics) for tests.

    Returns indices of kept boxes in descending score order.
    """
    import numpy as np

    order = np.argsort(-np.asarray(scores), kind="stable")
    boxes = np.asarray(boxes, dtype=np.float64)
    kept = []
    for i in order:
        ok = True
        for j in kept:
            tl = np.maximum(boxes[i, 0:2], boxes[j, 0:2])
            br = np.minimum(boxes[i, 2:4], boxes[j, 2:4])
            if np.all(tl < br):
                inter = np.prod(br - tl)
            else:
                inter = 0.0
            a1 = np.prod(boxes[i, 2:4] - boxes[i, 0:2])
            a2 = np.prod(boxes[j, 2:4] - boxes[j, 0:2])
            iou = inter / (a1 + a2 - inter + 1e-7)
            if iou > iou_threshold:
                ok = False
                break
        if ok:
            kept.append(int(i))
    return kept
