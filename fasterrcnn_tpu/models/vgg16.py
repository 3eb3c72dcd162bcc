"""VGG-16 backbone in flax (NHWC, XLA-compiled).

Capability parity with reference pytorch/FasterRCNN/models/vgg16.py:22-158
and tf2/FasterRCNN/models/vgg16.py (13 convs, stride-16 feature map, 4096-d
two-layer fully-connected head) — written TPU-first:

  * NHWC layout, compute dtype configurable (bf16 fast path on the MXU).
  * Max pools use VALID padding (floor semantics) so feature extents match
    the reference's `height // 16` rule (vgg16.py:155-158) for any size.
  * Blocks 1-2 are frozen during training via optax masking (the reference
    sets requires_grad=False, vgg16.py:49-58) — see frozen_param_patterns.

Parameter names (block{i}_conv{j}, fc1/fc2) define the weight-import contract
for Caffe `vgg16_caffe.pth` / Bart-Keras h5 checkpoints (utils/checkpoint.py).
"""

from __future__ import annotations

import os

import jax
from flax import linen as nn
import jax.numpy as jnp

from fasterrcnn_tpu.data.image import CAFFE_BGR
from fasterrcnn_tpu.models.backbone import BackboneSpec, register_backbone
from fasterrcnn_tpu.ops.conv_s2d import (
    conv3x3_s2dw_packed,
    maxpool2x2_packed,
    pack_width,
)

_BLOCKS = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class _PackedConv3x3(nn.Module):
    """3x3 SAME conv+ReLU computed in the width-packed layout
    (ops/conv_s2d.py). Parameter names/shapes/initializers are identical
    to the nn.Conv it replaces — `kernel` (3, 3, Cin, Cout) HWIO,
    lecun-normal; `bias` (Cout,), zeros — so checkpoints, weight importers
    and the frozen-pattern masks are unaffected by which path runs."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return conv3x3_s2dw_packed(
            xp.astype(self.dtype), kernel.astype(self.dtype), bias, relu=True
        )


class VGG16FeatureExtractor(nn.Module):
    """conv1_1..conv5_3; pools after blocks 1-4 only (stride-16 output)."""

    dtype: str = "float32"
    freeze: bool = True  # False in from-scratch mode (ModelConfig.train_all)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        # Block 1 runs in the width-packed layout (ops/conv_s2d.py): at
        # C=3/64 the direct convs fill at most half the MXU's contraction
        # depth and half its output lanes (hardware A/B: conv1_1 at 0.9%
        # MFU, conv1_2 at 21% — together ~1/3 of the backbone's time for
        # 12% of its FLOPs). Packing width pairs into lanes costs 2x the
        # padded FLOPs but lifts both layers ~1.6-2x measured (7.7->3.8,
        # 6.9->4.5 ms at bs=8 608x800); pack happens once at the image,
        # pool1 consumes the packed layout directly, and blocks 2+ (where
        # the direct conv wins) run unchanged. Same params, same math —
        # scripts/profile_conv.py carries the per-layer numbers.
        packed_b1 = (
            os.environ.get("FRCNN_PACKED_BLOCK1", "1") != "0"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        for block_idx, (num_convs, channels) in enumerate(_BLOCKS):
            if block_idx == 0 and packed_b1:
                xp = pack_width(x.astype(dtype))
                xp = _PackedConv3x3(
                    channels, x.shape[-1], dtype, name="block1_conv1"
                )(xp)
                xp = _PackedConv3x3(
                    channels, channels, dtype, name="block1_conv2"
                )(xp)
                x = maxpool2x2_packed(xp)
                continue
            for conv_idx in range(num_convs):
                x = nn.Conv(
                    channels,
                    (3, 3),
                    padding="SAME",
                    dtype=dtype,
                    param_dtype=jnp.float32,
                    name=f"block{block_idx + 1}_conv{conv_idx + 1}",
                )(x)
                x = nn.relu(x)
            if block_idx < 4:  # no pool after block 5
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
            if block_idx == 1 and self.freeze:
                # Blocks 1-2 are frozen (reference requires_grad=False,
                # vgg16.py:49-58). The optimizer mask already zeroes their
                # updates; cutting the gradient here additionally lets XLA
                # skip their whole backward pass — these full-resolution
                # layers are ~30% of the backbone's FLOPs.
                x = jax.lax.stop_gradient(x)
        return x


class VGG16Head(nn.Module):
    """Pooled RoI (P, 7, 7, 512) -> feature vector (P, 4096).

    Flatten order is HWC (NHWC-native). Imported Caffe/torch weights are
    permuted accordingly at load time (reference documents the reverse recipe
    for Keras->torch, state.py:150-157).
    """

    dtype: str = "float32"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, rois: jnp.ndarray, *, deterministic: bool = True):
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = rois.reshape(rois.shape[0], -1).astype(dtype)
        x = nn.relu(nn.Dense(4096, dtype=dtype, param_dtype=jnp.float32, name="fc1")(x))
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=dtype, param_dtype=jnp.float32, name="fc2")(x))
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


def _make_spec() -> BackboneSpec:
    return BackboneSpec(
        name="vgg16",
        feature_map_channels=512,
        feature_pixels=16,
        feature_vector_size=4096,
        preprocessing=CAFFE_BGR,
        fm_ceil_mode=False,
        make_feature_extractor=lambda dtype, freeze=True: VGG16FeatureExtractor(
            dtype=dtype, freeze=freeze
        ),
        make_head=lambda dtype, dropout, freeze=True: VGG16Head(
            dtype=dtype, dropout=dropout
        ),
        frozen_param_patterns=(r".*block1_conv.*", r".*block2_conv.*"),
    )


def _make_torch_spec() -> BackboneSpec:
    """The reference's second VGG-16 flavor (vgg16_torch.py): same topology,
    torchvision weight source and RGB/255 preprocessing (vgg16_torch.py:64)."""
    from fasterrcnn_tpu.data.image import TORCHVISION_RGB
    import dataclasses

    return dataclasses.replace(
        _make_spec(), name="vgg16-torch", preprocessing=TORCHVISION_RGB
    )


register_backbone("vgg16", _make_spec)
register_backbone("vgg16-torch", _make_torch_spec)
