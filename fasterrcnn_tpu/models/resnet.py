"""ResNet-50/101/152 backbones in flax (NHWC, frozen BatchNorm).

Capability parity with reference pytorch/FasterRCNN/models/resnet.py:27-185,
TPU-first:

  * BatchNorm is *frozen* everywhere — both statistics and affines — which
    the reference found mAP-critical (resnet.py:53-77). Frozen BN is a pure
    per-channel affine, so it is represented here as a FrozenBatchNorm module
    holding precomputed (scale, bias) params; XLA folds it into the adjacent
    conv. There is no train/eval mode split to get wrong.
  * Explicit torch-style paddings (conv1: 3, 3x3 convs: 1, maxpool: 1)
    instead of SAME, so sampling positions — and therefore imported
    torchvision weights — match exactly for any input size. Feature extent
    follows the reference's ceil(size/16) rule (resnet.py:161-185).
  * Stage split per the reference: feature extractor = conv1..layer3
    (stride 16, 1024 channels, resnet.py:38-46); the RoI head = layer4 on
    7x7 pooled RoIs + global spatial mean (resnet.py:109-118).
  * Freezing: conv1/bn1/layer1 and every BN affine are excluded from the
    optimizer via frozen_param_patterns (resnet.py:48-51).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
from flax import linen as nn
import jax.numpy as jnp

from fasterrcnn_tpu.data.image import TORCHVISION_RGB
from fasterrcnn_tpu.models.backbone import BackboneSpec, register_backbone

# Bottleneck counts per stage (layer1..layer4), torchvision architectures.
ARCHITECTURES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """Per-channel affine y = x * scale + bias.

    scale/bias are precomputed at weight import as gamma/sqrt(var+eps) and
    beta - mean*scale; fresh initialization is identity (or zero scale for
    each bottleneck's final BN in from-scratch mode — see Bottleneck). Both
    params appear in frozen_param_patterns so the optimizer never touches
    them unless ModelConfig.train_all lifts the freeze.
    """

    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut when needed."""

    channels: int  # bottleneck width; output is channels * 4
    stride: int = 1
    dtype: str = "float32"
    freeze: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        out_channels = self.channels * 4
        conv_kwargs = dict(use_bias=False, dtype=dtype, param_dtype=jnp.float32)

        residual = x
        y = nn.Conv(self.channels, (1, 1), name="conv1", **conv_kwargs)(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            name="conv2",
            **conv_kwargs,
        )(y)
        y = FrozenBatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_channels, (1, 1), name="conv3", **conv_kwargs)(y)
        # From-scratch (freeze=False): zero-init the final BN scale so every
        # residual branch starts closed and the net behaves like a shallow
        # one at init (Goyal et al. 2017) — without this a fresh 101-layer
        # stack with affine-only "BN" trains impractically slowly. Imported
        # weights overwrite the init, so pretrained paths are unaffected.
        bn3_scale_init = (
            nn.initializers.ones if self.freeze else nn.initializers.zeros
        )
        y = FrozenBatchNorm(name="bn3", scale_init=bn3_scale_init)(y)

        if residual.shape[-1] != out_channels or self.stride != 1:
            residual = nn.Conv(
                out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                name="downsample_conv",
                **conv_kwargs,
            )(residual)
            residual = FrozenBatchNorm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    num_blocks: int
    channels: int
    stride: int
    dtype: str = "float32"
    freeze: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_blocks):
            x = Bottleneck(
                channels=self.channels,
                stride=self.stride if i == 0 else 1,
                dtype=self.dtype,
                freeze=self.freeze,
                name=f"block{i}",
            )(x)
        return x


class ResNetFeatureExtractor(nn.Module):
    """conv1 .. layer3: (B, H, W, 3) -> (B, ceil(H/16), ceil(W/16), 1024)."""

    blocks: Sequence[int]
    dtype: str = "float32"
    freeze: bool = True  # False in from-scratch mode (ModelConfig.train_all)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(name="bn1")(x)
        x = nn.relu(x)
        # torch maxpool k3 s2 pad 1: pad with -inf so padding never wins.
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ResNetStage(
            self.blocks[0], 64, 1, self.dtype, self.freeze, name="layer1"
        )(x)
        if self.freeze:
            # conv1/bn1/layer1 are frozen (reference requires_grad=False,
            # resnet.py:48-51); cutting the gradient here lets XLA skip their
            # backward pass entirely (the optimizer mask already zeroes
            # updates). Lifted in from-scratch mode (ModelConfig.train_all).
            x = jax.lax.stop_gradient(x)
        x = ResNetStage(
            self.blocks[1], 128, 2, self.dtype, self.freeze, name="layer2"
        )(x)
        x = ResNetStage(
            self.blocks[2], 256, 2, self.dtype, self.freeze, name="layer3"
        )(x)
        return x


class ResNetHead(nn.Module):
    """layer4 over pooled RoIs: (P, 7, 7, 1024) -> (P, 2048) via spatial mean
    (reference resnet.py:109-118)."""

    blocks: Sequence[int]
    dtype: str = "float32"
    dropout: float = 0.0  # unused; ResNet head has no dropout (parity)
    freeze: bool = True

    @nn.compact
    def __call__(self, rois: jnp.ndarray, *, deterministic: bool = True):
        x = ResNetStage(
            self.blocks[3], 512, 2, self.dtype, self.freeze, name="layer4"
        )(rois)
        return x.mean(axis=(1, 2))


def _make_spec(arch: str) -> BackboneSpec:
    blocks = ARCHITECTURES[arch]
    return BackboneSpec(
        name=arch,
        feature_map_channels=1024,
        feature_pixels=16,
        feature_vector_size=2048,
        preprocessing=TORCHVISION_RGB,
        fm_ceil_mode=True,
        make_feature_extractor=lambda dtype, freeze=True: ResNetFeatureExtractor(
            blocks=blocks, dtype=dtype, freeze=freeze
        ),
        make_head=lambda dtype, dropout, freeze=True: ResNetHead(
            blocks=blocks, dtype=dtype, freeze=freeze
        ),
        frozen_param_patterns=(
            r".*feature_extractor/conv1.*",
            r".*feature_extractor/bn1.*",
            r".*layer1/.*",
            r".*/bn\d/.*",  # every BN affine, all stages incl. layer4
            r".*downsample_bn/.*",
        ),
    )


for _arch in ARCHITECTURES:
    register_backbone(_arch, lambda a=_arch: _make_spec(a))
