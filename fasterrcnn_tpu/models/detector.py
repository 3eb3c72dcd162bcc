"""Detector stage: RoI features -> class scores + per-class box deltas.

Capability parity with reference pytorch/FasterRCNN/models/detector.py:20-80
and tf2 detector.py:24-118, TPU-first: RoI pooling is the dense
crop-and-resize fast path (ops/roi.py), the head is the backbone's pooled-
feature module, and the two linear heads use the reference's N(0,0.01) /
N(0,0.001) initializations (detector.py:33-36). Operates on a fixed, padded
RoI count; garbage rows from padded RoIs are masked downstream.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class DetectorHeads(nn.Module):
    """Feature vectors (P, F) -> class logits (P, C) and box deltas
    (P, 4*(C-1)). Background class 0 has no box regressor (detector.py:30)."""

    num_classes: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        class_logits = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=0.01),
            dtype=dtype,
            param_dtype=jnp.float32,
            name="classifier",
        )(features)
        box_deltas = nn.Dense(
            4 * (self.num_classes - 1),
            kernel_init=nn.initializers.normal(stddev=0.001),
            dtype=dtype,
            param_dtype=jnp.float32,
            name="regressor",
        )(features)
        return class_logits.astype(jnp.float32), box_deltas.astype(jnp.float32)
