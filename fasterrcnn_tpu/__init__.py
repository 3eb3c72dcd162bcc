"""fasterrcnn_tpu: a TPU-native Faster R-CNN framework in JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of trzy/FasterRCNN (reference:
/root/reference, which ships parallel PyTorch and TF2 trees) as a single
TPU-first JAX tree:

  * Everything dynamic-shaped in the reference (top-K proposal selection, NMS,
    RoI pooling, proposal labeling/sampling) is fixed-shape + masked here, so
    the entire two-stage forward/backward jit-compiles end-to-end and batches.
  * Layout is NHWC (TPU conv-native); compute dtype is configurable
    (bfloat16 fast path, float32 parity path).
  * Scale-out is a `jax.sharding.Mesh`: data parallel over the batch axis,
    optional tensor parallel over the detector's fully-connected layers.

Package map (reference parity per SURVEY.md section 2):
  ops/      geometry + fixed-shape kernels (anchors, IoU, NMS, RoI, sampling)
  models/   backbones (VGG-16, ResNet-50/101/152), RPN, detector, orchestrator
  data/     VOC loader, preprocessing, padded/bucketed batching
  parallel/ device mesh + sharding rules
  utils/    checkpointing & weight import, eval statistics, visualization, logs
"""

__version__ = "0.1.0"
