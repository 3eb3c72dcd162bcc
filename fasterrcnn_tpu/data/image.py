"""Image loading and resize (host side), normalization params (device side).

Re-designed from reference datasets/image.py (pytorch tree, :21-101) with one
TPU-first change: the host pipeline keeps images as uint8 HWC and ships them
to the device raw; channel reordering / scaling / standardization happen
*inside* the jit-compiled model (see models/backbone.py `normalize_images`).
That quarters host->HBM transfer volume and fuses normalization into the
first conv's input pipeline.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Optional, Tuple

import numpy as np
import os
from PIL import Image


class ChannelOrder(Enum):
    RGB = "RGB"
    BGR = "BGR"


@dataclasses.dataclass(frozen=True)
class PreprocessingParams:
    """Normalization contract per backbone (reference image.py:21-31).

    Applied in order: channel reorder, * scaling, - means, / stds, with means
    and stds given in the target channel order.
    """

    channel_order: ChannelOrder
    scaling: float
    means: Tuple[float, float, float]
    stds: Tuple[float, float, float]


# Caffe-VGG16 convention (reference vgg16.py:146).
CAFFE_BGR = PreprocessingParams(
    channel_order=ChannelOrder.BGR,
    scaling=1.0,
    means=(103.939, 116.779, 123.680),
    stds=(1.0, 1.0, 1.0),
)
# Torchvision convention (reference resnet.py:141, vgg16_torch.py:64).
TORCHVISION_RGB = PreprocessingParams(
    channel_order=ChannelOrder.RGB,
    scaling=1.0 / 255.0,
    means=(0.485, 0.456, 0.406),
    stds=(0.229, 0.224, 0.225),
)


def compute_scale_factor(
    original_width: int,
    original_height: int,
    min_dimension_pixels: Optional[int],
    max_dimension_pixels: Optional[int] = None,
) -> float:
    """Scale so the shorter side equals min_dimension_pixels (image.py:34-41).

    max_dimension_pixels caps the LONGER side: an extreme-aspect image
    (>1600/600 ~= 2.66:1 at the defaults) scales down further so it still
    fits the largest canvas bucket instead of killing the run mid-epoch —
    ground truth scales with the same factor, so geometry stays consistent.
    """
    if not min_dimension_pixels:
        return 1.0
    short = min(original_width, original_height)
    long_ = max(original_width, original_height)
    scale = min_dimension_pixels / short
    if max_dimension_pixels and long_ * scale > max_dimension_pixels:
        scale = max_dimension_pixels / long_
    return scale


# Largest aspect ratio the native scratch canvas covers at min-side 600.
_NATIVE_SCRATCH_SIDE = 1664


def load_image(
    url: str,
    min_dimension_pixels: Optional[int] = 600,
    horizontal_flip: bool = False,
    use_native: bool = True,
    max_dimension_pixels: Optional[int] = None,
):
    """Load and resize an image; no normalization (that runs on device).

    Uses the native C++ loader (native/loader.cc: libjpeg + threaded bilinear
    resize) for local JPEG files when available, PIL otherwise.

    Returns:
      (image_u8, pil_image, scale_factor, original_shape) where image_u8 is
      (H, W, 3) uint8 RGB, pil_image is the resized PIL image for drawing,
      and original_shape is (3, orig_h, orig_w) matching the reference's
      return convention (image.py:101).
    """
    if isinstance(url, str) and url.startswith(("http://", "https://")):
        # The reference's predict_one accepts URLs (imageio fetch,
        # pytorch __main__.py:237-240, datasets/image.py:59). Fetch the
        # bytes and fall through to the PIL decode path.
        import io
        import urllib.request

        with urllib.request.urlopen(url) as resp:
            data = resp.read()
        return load_image(
            io.BytesIO(data),
            min_dimension_pixels=min_dimension_pixels,
            horizontal_flip=horizontal_flip,
            use_native=False,
            max_dimension_pixels=max_dimension_pixels,
        )
    if (
        use_native
        and min_dimension_pixels
        and isinstance(url, str)
        and os.path.isfile(url)
        and url.lower().endswith((".jpg", ".jpeg"))
    ):
        result = _load_image_native(
            url, min_dimension_pixels, horizontal_flip, max_dimension_pixels
        )
        if result is not None:
            return result
    image = Image.open(url).convert("RGB")
    original_width, original_height = image.width, image.height
    if horizontal_flip:
        image = image.transpose(method=Image.FLIP_LEFT_RIGHT)
    if min_dimension_pixels is not None:
        scale_factor = compute_scale_factor(
            original_width=image.width,
            original_height=image.height,
            min_dimension_pixels=min_dimension_pixels,
            max_dimension_pixels=max_dimension_pixels,
        )
        width = int(image.width * scale_factor)
        height = int(image.height * scale_factor)
        image = image.resize((width, height), resample=Image.BILINEAR)
    else:
        scale_factor = 1.0
    image_u8 = np.asarray(image, dtype=np.uint8)
    return image_u8, image, scale_factor, (3, original_height, original_width)


def _load_image_native(url: str, min_dim: int, flip: bool, max_dim=None):
    """JPEG decode+resize via the C++ loader; None -> caller falls back."""
    from fasterrcnn_tpu.data import native_loader

    if not native_loader.available():
        return None
    try:
        with open(url, "rb") as f:
            jpeg = f.read()
        scratch = np.empty(
            (_NATIVE_SCRATCH_SIDE, _NATIVE_SCRATCH_SIDE, 3), np.uint8
        )
        rh, rw, oh, ow = native_loader.decode_resize_into(
            jpeg, scratch, min_dim, flip, max_side=max_dim or 0
        )
    except Exception:
        return None
    image_u8 = np.ascontiguousarray(scratch[:rh, :rw])
    scale_factor = compute_scale_factor(ow, oh, min_dim, max_dim)
    pil_image = Image.fromarray(image_u8)
    return image_u8, pil_image, scale_factor, (3, oh, ow)
