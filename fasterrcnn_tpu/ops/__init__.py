"""Fixed-shape geometry and selection ops (the TPU-native replacements for the
reference's NumPy box math and the CUDA/TF library kernels it leaned on)."""

from fasterrcnn_tpu.ops.boxes import (
    corners_to_centers,
    centers_to_corners,
    iou_matrix,
    encode_deltas,
    decode_deltas,
)
