"""Static configuration for the Faster R-CNN model and training loop.

The reference deliberately hard-codes most hyperparameters (reference
README.md:128); we keep the same defaults but collect them into frozen,
hashable dataclasses so they can be closed over by jit-compiled functions.

Hyperparameter provenance (file:line into /root/reference):
  * anchor areas/aspects:      pytorch/FasterRCNN/models/anchors.py:33-34
  * RPN IoU thresholds:        pytorch/FasterRCNN/models/anchors.py:137
  * pre/post-NMS proposal caps pytorch/FasterRCNN/models/faster_rcnn.py:124-125,302-303
  * RPN NMS IoU 0.7:           pytorch/FasterRCNN/models/rpn.py:147-151
  * min proposal side 16px:    pytorch/FasterRCNN/models/rpn.py:139-144
  * RPN minibatch 256:         pytorch/FasterRCNN/models/faster_rcnn.py:36
  * proposal batch 128 @ 25%:  pytorch/FasterRCNN/models/faster_rcnn.py:36,320-326
  * detector delta stds:       pytorch/FasterRCNN/models/faster_rcnn.py:63-64
  * detector IoU thresholds:   pytorch/FasterRCNN/models/faster_rcnn.py:314-319
  * per-class test NMS 0.3:    pytorch/FasterRCNN/models/faster_rcnn.py:213-226
  * loss sigmas (3.0 / 1.0):   pytorch/FasterRCNN/models/rpn.py:235, detector.py:129
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor pyramid: 3 areas x 3 aspect ratios = 9 anchors per cell."""

    areas: Tuple[float, ...] = (128.0 * 128.0, 256.0 * 256.0, 512.0 * 512.0)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    feature_pixels: int = 16  # stride of the backbone feature map

    @property
    def num_anchors(self) -> int:
        return len(self.areas) * len(self.aspect_ratios)


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    object_iou_threshold: float = 0.7
    background_iou_threshold: float = 0.3
    nms_iou_threshold: float = 0.7
    pre_nms_train: int = 12000
    post_nms_train: int = 2000
    pre_nms_infer: int = 6000
    post_nms_infer: int = 300
    minibatch_size: int = 256
    max_positive_fraction: float = 0.5  # at most half of the minibatch positive
    min_proposal_side: float = 16.0
    regression_sigma: float = 3.0


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    proposal_batch_size: int = 128
    positive_fraction: float = 0.25
    min_background_iou: float = 0.0
    min_object_iou: float = 0.5
    delta_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    delta_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    test_nms_iou_threshold: float = 0.3
    # Per-class detection rows in the fixed-shape predict output. 0 (default)
    # means "one row per proposal" (rpn.post_nms_infer), which keeps every
    # per-class NMS survivor — the reference's semantics (its predict keeps
    # all survivors, faster_rcnn.py:213-226). A positive value trades output
    # size for possible truncation of crowded classes.
    max_detections_per_class: int = 0
    regression_sigma: float = 1.0
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_classes: int = 21  # VOC: background + 20 object classes
    backbone: str = "vgg16"
    anchors: AnchorConfig = AnchorConfig()
    rpn: RPNConfig = RPNConfig()
    detector: DetectorConfig = DetectorConfig()
    # Whether proposals generated at image-boundary-crossing anchors are kept
    # (reference default: allow_edge_proposals=True, faster_rcnn.py:36).
    allow_edge_proposals: bool = True
    # Maximum number of ground-truth boxes per padded sample. VOC2007 tops out
    # at 42 objects in one image; 56 gives slack and is a multiple of 8.
    max_gt_boxes: int = 56
    # Compute dtype for conv/matmul heavy layers ("float32" or "bfloat16").
    compute_dtype: str = "float32"
    # RoI feature extraction: "crop" = 14x14 bilinear crop + 2x2 max pool
    # (tf2 tree fast path, detector.py:87-100); "exact_pool" = torchvision
    # RoIPool quantization (pytorch tree / tf2 --custom-roi-pool,
    # roi_pooling_layer.py) for parity with RoIPool-trained checkpoints.
    roi_mode: str = "crop"
    # From-scratch mode: train every parameter. The reference's freeze
    # patterns (VGG blocks 1-2, vgg16.py:49-58; ResNet conv1/bn1/layer1 and
    # all BN affines, resnet.py:48-77) exist to protect ImageNet-pretrained
    # weights — with random initialization they would freeze noise. When
    # True the optimizer masks and backward stop_gradient cuts are disabled,
    # and fresh ResNets zero-init each bottleneck's final BN scale so the
    # residual branches open gradually (the standard from-scratch deep-ResNet
    # initialization). No effect on checkpoint structure or imports.
    train_all: bool = False

    @property
    def compute_jnp_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    epochs: int = 1
    augment: bool = True
    batch_size: int = 1
    # Gradient clipping (the tf2 tree exposes --clipnorm, tf2 __main__.py:341).
    clipnorm: float = 0.0
    optimizer: str = "sgd"  # "sgd" or "adam" (tf2 __main__.py:337)
    beta1: float = 0.9
    beta2: float = 0.999
    # Learning-rate schedule. "constant" is the reference's behavior (its
    # two-phase recipe restarts the run at lr/10 instead); "cosine" adds
    # linear warmup over warmup_steps then cosine decay to 0 at total_steps
    # — the standard from-scratch schedule (no reference counterpart).
    # total_steps must be > 0 for cosine; the CLI derives it from
    # epochs x ceil(num_samples / batch_size).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    total_steps: int = 0


# Canvas buckets: every preprocessed image (shorter side scaled to 600) is
# padded into the smallest fitting (height, width) canvas so XLA sees a small,
# fixed set of shapes. Sides are multiples of 32 so all backbone strides
# divide them exactly. The common VOC shapes (500x375 -> 800x600 and its
# transpose) land in the first two buckets with <2% padding waste.
CANVAS_BUCKETS: Tuple[Tuple[int, int], ...] = (
    (128, 160),  # tiny smoke-test bucket (never hit by min-side-600 VOC data)
    (160, 128),
    (608, 608),
    (608, 800),
    (800, 608),
    (608, 928),
    (928, 608),
    (608, 1120),
    (1120, 608),
    (608, 1600),
    (1600, 608),
)


def select_canvas(height: int, width: int) -> Tuple[int, int]:
    """Smallest canvas bucket that fits an (height, width) image."""
    best = None
    for ch, cw in CANVAS_BUCKETS:
        if ch >= height and cw >= width:
            area = ch * cw
            if best is None or area < best[0]:
                best = (area, (ch, cw))
    if best is None:
        raise ValueError(f"No canvas bucket fits image of size {height}x{width}")
    return best[1]
