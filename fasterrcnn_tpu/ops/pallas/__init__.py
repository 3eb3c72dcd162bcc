"""Hand-written Pallas TPU kernels for the hot fixed-shape ops (NMS, RoI).

Backend selection: each kernel family has its own predicate so one can be
disabled independently (e.g. to bisect an NMS issue without also switching
the RoI extraction path). Both default to "on when running on a real TPU";
the env kill-switches exist for debugging only.
"""

import os

import jax


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def use_nms_kernel() -> bool:
    """Pallas NMS on real TPUs unless FRCNN_NO_PALLAS_NMS is set."""
    return _on_tpu() and not os.environ.get("FRCNN_NO_PALLAS_NMS")


def use_roi_kernel() -> bool:
    """Pallas RoI crop+pool on real TPUs unless FRCNN_NO_PALLAS_ROI is set."""
    return _on_tpu() and not os.environ.get("FRCNN_NO_PALLAS_ROI")
