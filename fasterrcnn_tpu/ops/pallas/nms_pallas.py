"""Greedy NMS as a Pallas TPU kernel.

The TPU-native replacement for the reference's CUDA torchvision.ops.nms
(reference rpn.py:24,147) / tf.image.non_max_suppression (tf2 rpn.py:116),
and the fast path over ops/nms.py's blocked XLA formulation.

Design: boxes arrive score-sorted (descending). The suppression state lives
in VMEM as an (R, 128) lane-major mask (R = K/128), so one greedy step —
"box i suppresses every lower-ranked box with IoU > threshold" — is a single
VPU sweep over all K candidates (~K/1024 cycles). Steps whose box is already
suppressed skip the sweep entirely via @pl.when, and a while_loop exits as
soon as `max_keep` boxes have been accepted, which at inference (300 of 6000)
cuts the sequential trip count by an order of magnitude.

Semantics are identical to ops/nms.nms (torchvision-compatible greedy,
strict-inequality IoU, reference epsilon), verified in tests/test_nms_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _nms_kernel(
    y1_ref, x1_ref, y2_ref, x2_ref, valid_ref, keep_ref, removed_ref,
    *, iou_threshold: float, max_keep: int, total: int,
):
    """Fully vectorized greedy scan: no scalar VMEM loads/stores (Mosaic
    forbids them).

    The loop iterates over ACCEPTS, not candidates: each trip finds the
    first still-alive index >= cursor with one masked-min reduction over
    the whole (R, 128) state, extracts that box's coordinates with one-hot
    row reductions, and runs the whole-state suppression sweep. Trip count
    is therefore min(#accepted, max_keep) regardless of how the data is
    distributed. The previous formulation visited candidates one linear
    index at a time, so inputs whose boxes suppress heavily (real scenes:
    proposals pile onto few objects, accepts stall below max_keep) walked
    most of the 12000 candidates in ~1 us serialized while_loop trips —
    measured 4.5x train-step inflation on scene data vs noise data, round
    4. Visiting accepts only makes the cost data-independent up to the
    accept count."""
    r = y1_ref.shape[0]
    y1 = y1_ref[...]
    x1 = x1_ref[...]
    y2 = y2_ref[...]
    x2 = x2_ref[...]
    areas = (y2 - y1) * (x2 - x1)  # (R, 128)

    # Lane-major linear index of each slot.
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
    linear = rows * LANES + cols
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    # removed = 1 for anything not a candidate; accepted output starts empty.
    removed_ref[...] = 1.0 - valid_ref[...]
    keep_ref[...] = jnp.zeros((r, LANES), jnp.float32)

    def cond(state):
        cursor, kept = state
        return (cursor < total) & (kept < max_keep)

    def body(state):
        cursor, kept = state
        # First alive candidate at or after the cursor (single reduction).
        cand = jnp.where(
            (removed_ref[...] == 0.0) & (linear >= cursor), linear, total
        )
        i = jnp.min(cand)
        found = i < total
        row = i // LANES
        col = i % LANES
        onehot = (lane == col).astype(jnp.float32)  # (1, 128)

        @pl.when(found)
        def _():
            iy1 = jnp.sum(y1_ref[pl.ds(row, 1), :] * onehot)
            ix1 = jnp.sum(x1_ref[pl.ds(row, 1), :] * onehot)
            iy2 = jnp.sum(y2_ref[pl.ds(row, 1), :] * onehot)
            ix2 = jnp.sum(x2_ref[pl.ds(row, 1), :] * onehot)
            iarea = (iy2 - iy1) * (ix2 - ix1)
            tl_y = jnp.maximum(y1, iy1)
            tl_x = jnp.maximum(x1, ix1)
            br_y = jnp.minimum(y2, iy2)
            br_x = jnp.minimum(x2, ix2)
            inter = jnp.maximum(br_y - tl_y, 0.0) * jnp.maximum(br_x - tl_x, 0.0)
            iou = inter / (areas + iarea - inter + 1e-7)
            suppress = (iou > iou_threshold) & (linear > i)
            removed_ref[...] = jnp.maximum(
                removed_ref[...], suppress.astype(jnp.float32)
            )
            keep_row = keep_ref[pl.ds(row, 1), :]
            keep_ref[pl.ds(row, 1), :] = jnp.maximum(keep_row, onehot)

        return (
            jnp.where(found, i + 1, total),
            kept + jnp.where(found, 1, 0),
        )

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_keep", "interpret")
)
def nms_keep_mask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_keep: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-sorted boxes.

    Args:
      boxes: (K, 4) corner boxes in descending score order, K % 128 == 0.
      valid: (K,) candidate mask.
      iou_threshold: strict-greater suppression threshold.
      max_keep: stop accepting after this many survivors (early exit).

    Returns:
      (K,) float32 mask of accepted boxes (at most max_keep ones).
    """
    k = boxes.shape[0]
    assert k % LANES == 0, f"K={k} must be a multiple of {LANES}"
    r = k // LANES

    planes = [
        boxes[:, i].reshape(r, LANES).astype(jnp.float32) for i in range(4)
    ]
    valid2d = valid.reshape(r, LANES).astype(jnp.float32)

    keep, _removed = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            iou_threshold=float(iou_threshold),
            max_keep=int(max_keep),
            total=k,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, LANES), jnp.float32),  # keep
            jax.ShapeDtypeStruct((r, LANES), jnp.float32),  # removed (scratch-ish)
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*planes, valid2d)
    return keep.reshape(k)
