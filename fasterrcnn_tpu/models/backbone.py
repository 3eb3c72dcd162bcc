"""Backbone protocol: static properties + flax module factories.

Re-designed from the reference's Backbone base class
(pytorch/FasterRCNN/models/backbone.py:30-65). The contract is the same —
feature extractor, pooled-RoI head, channel/stride/vector-size constants,
preprocessing params, feature-map-shape rule — but expressed as a frozen
spec of flax module factories instead of an nn.Module subclass, so the whole
model stays a pure-functional pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fasterrcnn_tpu.data.image import ChannelOrder, PreprocessingParams


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    name: str
    feature_map_channels: int
    feature_pixels: int
    feature_vector_size: int
    preprocessing: PreprocessingParams
    # floor (VGG, vgg16.py:155-158) vs ceil (ResNet, resnet.py:161-185)
    # feature-map extent for a given image extent.
    fm_ceil_mode: bool
    # Factories receive (dtype, freeze) / (dtype, dropout, freeze); freeze
    # is False in from-scratch mode (ModelConfig.train_all), which lifts the
    # stop_gradient backward cuts and from-scratch-unfriendly initializers.
    make_feature_extractor: Callable[[str, bool], nn.Module]
    make_head: Callable[[str, float, bool], nn.Module]
    # Regex patterns of parameter paths frozen during training (reference
    # freezes VGG blocks 1-2, vgg16.py:49-58; ResNet conv1/bn1/layer1 and all
    # BN affines, resnet.py:48-77).
    frozen_param_patterns: Tuple[str, ...]

    def compute_feature_map_shape(self, image_height: int, image_width: int):
        s = self.feature_pixels
        if self.fm_ceil_mode:
            return (-(-image_height // s), -(-image_width // s))
        return (image_height // s, image_width // s)


def normalize_images(images_u8: jnp.ndarray, pre: PreprocessingParams, dtype):
    """uint8 RGB (B, H, W, 3) -> normalized (B, H, W, 3) in `dtype`, on device.

    Fuses the reference's host-side _preprocess_vgg16 (image.py:43-57) into
    the jit program: reorder channels, scale, subtract means, divide stds.
    """
    x = images_u8.astype(jnp.float32)
    if pre.channel_order == ChannelOrder.BGR:
        x = x[..., ::-1]
    x = x * pre.scaling
    x = (x - jnp.asarray(pre.means, jnp.float32)) / jnp.asarray(pre.stds, jnp.float32)
    return x.astype(dtype)


_REGISTRY = {}


def register_backbone(name: str, factory: Callable[[], BackboneSpec]):
    _REGISTRY[name] = factory


def get_backbone(name: str) -> BackboneSpec:
    # Import here to avoid import cycles; registration happens on module load.
    from fasterrcnn_tpu.models import vgg16, resnet  # noqa: F401

    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown backbone '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]()
