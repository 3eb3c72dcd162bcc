"""RoI feature extraction: crop-and-resize (MXU formulation) and exact RoI
max-pooling.

Replaces the reference's library kernels:
  * tf.image.crop_and_resize + 2x2 max-pool (tf2/FasterRCNN/models/
    detector.py:87-100) — our *fast path*. Bilinear sampling is expressed as
    two small dense matmuls per RoI (interpolation-weight matrices contracted
    against the feature map), which XLA maps straight onto the MXU — no
    gathers, no dynamic shapes.
  * torchvision.ops.RoIPool (pytorch/FasterRCNN/models/detector.py:16,27) —
    exact max-pool quantization semantics (`roi_pool_exact`, a dense masked
    XLA formulation), provided for parity with checkpoints trained under
    the PyTorch tree. A NumPy oracle lives in tests.

On TPU, both inference and training route RoI extraction through the
tap-based Pallas kernel (ops/pallas/roi_pallas.roi_pool_taps_pallas, ~2.1x
faster than the einsum path below; it carries a custom VJP with a Pallas
backward kernel). The einsum path remains the oracle and the CPU/test path.

Both paths take a *fixed* number of padded RoIs and return fixed-shape
outputs; invalid RoIs produce garbage that callers mask out (they cost the
same FLOPs either way — that is the point of padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_weights(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """Bilinear interpolation weight matrix.

    Args:
      coords: (..., S) sample positions in source-pixel space [0, size-1].
        Positions outside the range contribute zero (crop_and_resize's
        extrapolation_value=0 semantics).
      size: number of source pixels.

    Returns:
      (..., S, size) weights such that `weights @ src` linearly interpolates.
    """
    lo = jnp.floor(coords)
    frac = coords - lo
    idx = jax.lax.broadcasted_iota(jnp.float32, (size,), 0)
    w_lo = jnp.where(idx == lo[..., None], 1.0 - frac[..., None], 0.0)
    w_hi = jnp.where(idx == lo[..., None] + 1.0, frac[..., None], 0.0)
    in_range = ((coords >= 0.0) & (coords <= size - 1.0))[..., None]
    return (w_lo + w_hi) * in_range


@functools.partial(jax.jit, static_argnames=("crop_size", "roi_chunk"))
def crop_and_resize(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    image_height,
    image_width,
    crop_size: int = 14,
    roi_chunk: int = 0,
    fm_height=None,
    fm_width=None,
) -> jnp.ndarray:
    """Bilinear crop of each RoI to (crop_size, crop_size), tf2-tree semantics.

    Args:
      feature_map: (H, W, C) NHWC feature map (single image). May be a
        padded-canvas map whose top-left (fm_height, fm_width) sub-grid
        corresponds to the real image.
      rois: (P, 4) boxes (y1, x1, y2, x2) in *image pixel* coordinates.
      image_height / image_width: real image extent in pixels (the tf2 tree
        normalizes RoIs by the image size, tf2 detector.py:92-96).
      crop_size: output side length.
      roi_chunk: if > 0 and it divides P, process RoIs in sequential chunks
        of this size, bounding the (chunk, crop, W, C) intermediate — the
        full (P, crop, W, C) tensor is the peak-memory hot spot at large
        batch (6.9 GB at B=32, P=300 on a 38x50x512 map).
      fm_height / fm_width: extent of the *real* feature grid (the cells the
        real image actually produced). Defaults to the full map shape — only
        correct when the map is unpadded. On a padded canvas, normalizing
        by the image but sampling the canvas grid stretches positions by
        canvas/image per axis; pass the real grid extent.

    Returns:
      (P, crop_size, crop_size, C) crops.

    Sampling grid matches tf.image.crop_and_resize: normalized corners map to
    [0, fm_dim-1] source space and crop_size points span them inclusively.
    """
    p = rois.shape[0]
    if roi_chunk and p % roi_chunk == 0 and p > roi_chunk:
        chunked = rois.reshape(p // roi_chunk, roi_chunk, 4)
        out = jax.lax.map(
            lambda r: crop_and_resize(
                feature_map,
                r,
                image_height,
                image_width,
                crop_size,
                fm_height=fm_height,
                fm_width=fm_width,
            ),
            chunked,
        )
        return out.reshape(p, crop_size, crop_size, feature_map.shape[-1])

    h, w, c = feature_map.shape
    compute_dtype = feature_map.dtype
    fm_h = h if fm_height is None else fm_height
    fm_w = w if fm_width is None else fm_width

    y1 = rois[:, 0] / image_height * (fm_h - 1)
    x1 = rois[:, 1] / image_width * (fm_w - 1)
    y2 = rois[:, 2] / image_height * (fm_h - 1)
    x2 = rois[:, 3] / image_width * (fm_w - 1)

    steps = jnp.arange(crop_size, dtype=jnp.float32) / max(crop_size - 1, 1)
    ys = y1[:, None] + (y2 - y1)[:, None] * steps[None, :]  # (P, S)
    xs = x1[:, None] + (x2 - x1)[:, None] * steps[None, :]

    wy = _interp_weights(ys, h).astype(compute_dtype)  # (P, S, H)
    wx = _interp_weights(xs, w).astype(compute_dtype)  # (P, S, W)

    # Precision: on the f32 parity path, force full-precision matmuls — the
    # TPU MXU's *default* f32 matmul uses bf16 passes (~4e-3 rel error),
    # too lossy for interpolation weights. On the bf16 fast path the inputs
    # are already bf16, and HIGHEST would upcast the (large) intermediates
    # to f32 for no accuracy gain — use the native pass there.
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # Two separable contractions; contract the LONGER feature axis first so
    # the (P, S, shorter_axis, C) intermediate — the HBM-traffic hot spot —
    # carries the shorter one. On a 608x800 canvas (38x50 map) w-first cuts
    # the RoI stage ~13% vs h-first (measured on v5e).
    if w >= h:
        cols = jnp.einsum("pqw,hwc->pqhc", wx, feature_map, precision=precision)
        crops = jnp.einsum("psh,pqhc->psqc", wy, cols, precision=precision)
    else:
        rows = jnp.einsum("psh,hwc->pswc", wy, feature_map, precision=precision)
        crops = jnp.einsum("pqw,pswc->psqc", wx, rows, precision=precision)
    return crops  # (P, y, x, C)


def roi_pool_features(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    image_height,
    image_width,
    output_size: int = 7,
    roi_chunk: int = 0,
    fm_height=None,
    fm_width=None,
) -> jnp.ndarray:
    """Fast-path RoI pooling: 2*output_size bilinear crop + 2x2 max pool.

    This is the tf2 tree's RoI layer (tf2 detector.py:87-100), which reached
    the same 71.0% VOC mAP as the PyTorch tree's RoIPool (reference
    README.md:38), and is the TPU-native choice: all dense math.
    """
    crops = crop_and_resize(
        feature_map,
        rois,
        image_height,
        image_width,
        crop_size=2 * output_size,
        roi_chunk=roi_chunk,
        fm_height=fm_height,
        fm_width=fm_width,
    )
    p, s, _, c = crops.shape
    pooled = crops.reshape(p, output_size, 2, output_size, 2, c).max(axis=(2, 4))
    return pooled


@functools.partial(jax.jit, static_argnames=("output_size", "spatial_scale"))
def roi_pool_exact(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float = 1.0 / 16.0,
    output_size: int = 7,
) -> jnp.ndarray:
    """Exact torchvision RoIPool quantization semantics, as dense masked maxes.

    For each RoI (y1,x1,y2,x2) in image space: corners are scaled & rounded to
    feature cells, the (inclusive) cell span is divided into output_size bins
    with floor/ceil boundaries, and each bin takes the max over its cells
    (empty bins yield 0). Matches torchvision.ops.RoIPool (reference
    detector.py:27 uses output 7x7, scale 1/16).

    Implementation: separable masked max — a (P, out, H) row-selection mask
    reduces H first, then a (P, out, W) mask reduces W. Cost O(P*out*(H+W)*C)
    with no gathers; fine for the import-parity path (the fast path is
    roi_pool_features).
    """
    h, w, c = feature_map.shape
    neg = jnp.asarray(-jnp.inf, feature_map.dtype)

    def bin_mask(lo_cell, hi_cell, size):
        """(P,) int32 cell spans -> (P, out, size) membership masks.

        Bin boundaries floor(span*b/out) / ceil(span*(b+1)/out) are computed
        in *integer* arithmetic: quantization is conceptually integral, and
        float evaluation is hazardous under fused excess-precision math (XLA
        CPU fast-math turns ceil(span/out*out) into span+1).
        """
        span = jnp.maximum(hi_cell - lo_cell + 1, 1)  # inclusive width >= 1
        b = jnp.arange(output_size, dtype=jnp.int32)
        starts = (span[:, None] * b[None, :]) // output_size + lo_cell[:, None]
        ends = (
            span[:, None] * (b[None, :] + 1) + output_size - 1
        ) // output_size + lo_cell[:, None]
        starts = jnp.clip(starts, 0, size)
        ends = jnp.clip(ends, 0, size)
        cells = jnp.arange(size, dtype=jnp.int32)
        return (cells[None, None, :] >= starts[..., None]) & (
            cells[None, None, :] < ends[..., None]
        )  # (P, out, size)

    # C++ round() = half away from zero; for non-negative coords this is
    # floor(x + 0.5) (jnp.round would round half to even and disagree on
    # exact .5 boundaries, e.g. x1=8 at scale 1/16).
    def round_half_up(v):
        return jnp.floor(v + 0.5).astype(jnp.int32)

    y1 = round_half_up(rois[:, 0] * spatial_scale)
    x1 = round_half_up(rois[:, 1] * spatial_scale)
    y2 = round_half_up(rois[:, 2] * spatial_scale)
    x2 = round_half_up(rois[:, 3] * spatial_scale)

    my = bin_mask(y1, y2, h)  # (P, out, H)
    mx = bin_mask(x1, x2, w)  # (P, out, W)

    # Row stage: (P, out, H) mask over (H, W, C) -> (P, out, W, C).
    rowmax = jnp.max(
        jnp.where(my[:, :, :, None, None], feature_map[None, None, :, :, :], neg),
        axis=2,
    )
    # Column stage: (P, out, W) mask over (P, out, W, C) -> (P, out, out, C).
    out = jnp.max(
        jnp.where(mx[:, None, :, :, None], rowmax[:, :, None, :, :], neg), axis=3
    )
    # Empty bins produce -inf on both paths; torchvision yields 0 there.
    return jnp.where(jnp.isfinite(out), out, 0.0)
