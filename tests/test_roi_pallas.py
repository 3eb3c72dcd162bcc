"""Pallas fused RoI crop+pool kernel vs the XLA einsum oracle.

These run the kernel in interpret mode on the CPU mesh; the same parity was
verified on TPU hardware (Mosaic) at f32 (maxerr ~2e-5) and bf16 (maxerr
within bf16 rounding of the oracle). See ops/pallas/roi_pallas.py for the
measured hardware comparison against the einsum path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import roi as roi_ops
from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_fused_pallas


def random_rois(rng, n, img_h, img_w):
    y1 = rng.uniform(0, img_h * 0.8, n)
    x1 = rng.uniform(0, img_w * 0.8, n)
    y2 = y1 + rng.uniform(16, img_h * 0.4, n)
    x2 = x1 + rng.uniform(16, img_w * 0.4, n)
    return np.stack(
        [y1, x1, np.minimum(y2, img_h), np.minimum(x2, img_w)], 1
    ).astype(np.float32)


@pytest.mark.parametrize("seed,chunk", [(0, 4), (1, 2), (2, 1)])
def test_matches_einsum_oracle(seed, chunk):
    rng = np.random.default_rng(seed)
    img_h, img_w = 600.0, 620.0
    real_fh, real_fw = 37, 38  # VGG floor rule on a 608x800 canvas: 38x50 map
    b, h, w, c, p = 2, 38, 50, 8, 8
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    rois = np.stack([random_rois(rng, p, img_h, img_w) for _ in range(b)])
    norm = np.tile(
        [[(real_fh - 1) / img_h, (real_fw - 1) / img_w]], (b, 1)
    ).astype(np.float32)

    got = np.asarray(
        roi_pool_fused_pallas(
            jnp.asarray(fm),
            jnp.asarray(rois),
            jnp.asarray(norm),
            interpret=True,
            chunk=chunk,
        )
    )
    want = np.stack(
        [
            np.asarray(
                roi_ops.roi_pool_features(
                    jnp.asarray(fm[i]),
                    jnp.asarray(rois[i]),
                    img_h,
                    img_w,
                    7,
                    fm_height=float(real_fh),
                    fm_width=float(real_fw),
                )
            )
            for i in range(b)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_out_of_range_rois_are_zero():
    """RoIs past the real grid sample zeros (extrapolation_value=0)."""
    rng = np.random.default_rng(3)
    b, h, w, c = 1, 16, 16, 8
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    # A RoI entirely beyond the feature grid in x.
    rois = np.asarray([[[2.0, 400.0, 10.0, 500.0]]], np.float32)
    norm = np.asarray([[15.0 / 256.0, 15.0 / 256.0]], np.float32)
    out = np.asarray(
        roi_pool_fused_pallas(
            jnp.asarray(fm), jnp.asarray(rois), jnp.asarray(norm),
            interpret=True, chunk=1,
        )
    )
    np.testing.assert_allclose(out, 0.0)


@pytest.mark.parametrize("seed,chunk", [(0, 5), (1, 2)])
def test_taps_kernel_matches_einsum_oracle(seed, chunk):
    from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_taps_pallas

    rng = np.random.default_rng(seed)
    img_h, img_w = 600.0, 620.0
    real_fh, real_fw = 37, 38
    b, h, w, c, p = 2, 38, 50, 128, 10
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    rois = np.stack([random_rois(rng, p, img_h, img_w) for _ in range(b)])
    norm = np.tile(
        [[(real_fh - 1) / img_h, (real_fw - 1) / img_w]], (b, 1)
    ).astype(np.float32)
    got = np.asarray(
        roi_pool_taps_pallas(
            jnp.asarray(fm), jnp.asarray(rois), jnp.asarray(norm),
            interpret=True, chunk=chunk,
        )
    )
    want = np.stack(
        [
            np.asarray(
                roi_ops.roi_pool_features(
                    jnp.asarray(fm[i]), jnp.asarray(rois[i]), img_h, img_w, 7,
                    fm_height=float(real_fh), fm_width=float(real_fw),
                )
            )
            for i in range(b)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_taps_kernel_out_of_range_rois_are_zero():
    from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_taps_pallas

    rng = np.random.default_rng(3)
    b, h, w, c = 1, 16, 16, 128
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    rois = np.asarray([[[2.0, 400.0, 10.0, 500.0]]], np.float32)
    norm = np.asarray([[15.0 / 256.0, 15.0 / 256.0]], np.float32)
    out = np.asarray(
        roi_pool_taps_pallas(
            jnp.asarray(fm), jnp.asarray(rois), jnp.asarray(norm),
            interpret=True, chunk=1,
        )
    )
    np.testing.assert_allclose(out, 0.0)
