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


def taps_mirror(fm, rois_fg, crop=14, out=7):
    """Pure-jnp mirror of the tap kernel's exact formulation (one image).

    Same wy construction, same clamped two-tap x interpolation, same pooling
    order — its jax.grad is the ground truth for the custom VJP. (The einsum
    oracle computes the same *function* but with different float
    associativity, so its argmax can flip on near-ties; the mirror cannot.)
    """
    import jax

    h, w, c = fm.shape
    steps = jnp.arange(crop, dtype=jnp.float32) / (crop - 1)

    def interp(pos, size):
        lo = jnp.floor(pos)
        frac = pos - lo
        idx = jnp.arange(size, dtype=jnp.float32)
        sheet = jnp.where(idx == lo[:, None], 1.0 - frac[:, None], 0.0) + jnp.where(
            idx == lo[:, None] + 1.0, frac[:, None], 0.0
        )
        in_r = (pos >= 0.0) & (pos <= size - 1.0)
        return sheet * in_r[:, None]

    def one(roi):
        ys = roi[0] + (roi[2] - roi[0]) * steps
        xs = roi[1] + (roi[3] - roi[1]) * steps
        wy = interp(ys, h).astype(fm.dtype)  # (crop, H)
        rows = jnp.einsum(
            "sh,hwc->swc", wy, fm, precision=jax.lax.Precision.HIGHEST
        )  # (crop_s, W, C)
        in_r = ((xs >= 0.0) & (xs <= w - 1.0)).astype(jnp.float32)
        xlo_f = jnp.clip(jnp.floor(xs), 0.0, w - 2.0)
        f = xs - xlo_f
        xlo = xlo_f.astype(jnp.int32)
        seg_lo = jnp.take(rows, xlo, axis=1)  # (s, q, C)
        seg_hi = jnp.take(rows, xlo + 1, axis=1)
        col = (
            seg_lo * ((1.0 - f) * in_r)[None, :, None]
            + seg_hi * (f * in_r)[None, :, None]
        )  # (s, q, C)
        yp = col.reshape(out, 2, crop, c).max(axis=1)  # (py, q, C)
        return yp.reshape(out, out, 2, c).max(axis=2)  # (py, px, C)

    return jnp.stack([one(rois_fg[i]) for i in range(rois_fg.shape[0])])


@pytest.mark.parametrize("seed,chunk", [(0, 2), (1, 1)])
def test_taps_kernel_vjp_matches_mirror(seed, chunk):
    """Custom Pallas backward == jax.grad of the exact jnp mirror."""
    import jax

    from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_taps_pallas

    rng = np.random.default_rng(seed)
    img_h, img_w = 600.0, 620.0
    real_fh, real_fw = 37, 38
    b, h, w, c, p = 2, 38, 50, 128, 4
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    rois = np.stack([random_rois(rng, p, img_h, img_w) for _ in range(b)])
    norm = np.tile(
        [[(real_fh - 1) / img_h, (real_fw - 1) / img_w]], (b, 1)
    ).astype(np.float32)
    cot = rng.normal(size=(b, p, 7, 7, c)).astype(np.float32)

    scale = norm[:, (0, 1, 0, 1)]
    rois_fg = (rois * scale[:, None, :]).astype(np.float32)

    def loss_kernel(fm_):
        out = roi_pool_taps_pallas(
            fm_, jnp.asarray(rois), jnp.asarray(norm), interpret=True, chunk=chunk
        )
        return jnp.sum(out * cot)

    def loss_mirror(fm_):
        out = jnp.stack(
            [taps_mirror(fm_[i], jnp.asarray(rois_fg[i])) for i in range(b)]
        )
        return jnp.sum(out * cot)

    g_kernel = np.asarray(jax.grad(loss_kernel)(jnp.asarray(fm)))
    g_mirror = np.asarray(jax.grad(loss_mirror)(jnp.asarray(fm)))
    np.testing.assert_allclose(g_kernel, g_mirror, rtol=1e-4, atol=1e-4)


def test_taps_kernel_vjp_tie_splitting():
    """A constant feature map makes every 2x2 window a 4-way tie; both the
    kernel (flat eq/cnt split) and jnp reduce_max (hierarchical split)
    resolve a 4-way tie to 0.25 each — gradients must agree exactly."""
    import jax

    from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_taps_pallas

    b, h, w, c, p = 1, 16, 20, 128, 2
    fm = np.ones((b, h, w, c), np.float32)
    rois = np.asarray([[[10.0, 10.0, 120.0, 150.0], [0.0, 0.0, 200.0, 250.0]]], np.float32)
    norm = np.asarray([[(h - 1) / 256.0, (w - 1) / 256.0]], np.float32)
    cot = np.ones((b, p, 7, 7, c), np.float32)

    scale = norm[:, (0, 1, 0, 1)]
    rois_fg = (rois * scale[:, None, :]).astype(np.float32)

    g_kernel = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                roi_pool_taps_pallas(
                    f, jnp.asarray(rois), jnp.asarray(norm), interpret=True, chunk=1
                )
                * cot
            )
        )(jnp.asarray(fm))
    )
    g_mirror = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                jnp.stack([taps_mirror(f[0], jnp.asarray(rois_fg[0]))]) * cot
            )
        )(jnp.asarray(fm))
    )
    np.testing.assert_allclose(g_kernel, g_mirror, rtol=1e-5, atol=1e-5)


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

def test_taps_bwd_channel_tiling_matches_untiled():
    """C > 512 backward runs as <=512-channel tiles (Mosaic scoped-vmem
    headroom at ResNet width, see roi_pool_taps_pallas_bwd). The tiled
    auto path (chunk=0) must equal both a forced untiled call and the jnp
    mirror's jax.grad."""
    import jax

    from fasterrcnn_tpu.ops.pallas.roi_pallas import (
        roi_pool_taps_pallas,
        roi_pool_taps_pallas_bwd,
    )

    rng = np.random.default_rng(5)
    img_h, img_w = 250.0, 300.0
    real_fh, real_fw = 15, 18
    b, h, w, c, p = 1, 16, 20, 640, 2  # c=640 -> five 128-channel tiles
    fm = rng.normal(size=(b, h, w, c)).astype(np.float32)
    rois = np.stack([random_rois(rng, p, img_h, img_w)])
    norm = np.tile(
        [[(real_fh - 1) / img_h, (real_fw - 1) / img_w]], (b, 1)
    ).astype(np.float32)
    cot = rng.normal(size=(b, p, 7, 7, c)).astype(np.float32)

    tiled = np.asarray(
        roi_pool_taps_pallas_bwd(
            jnp.asarray(fm), jnp.asarray(rois), jnp.asarray(norm),
            jnp.asarray(cot), interpret=True,
        )
    )
    untiled = np.asarray(
        roi_pool_taps_pallas_bwd(
            jnp.asarray(fm), jnp.asarray(rois), jnp.asarray(norm),
            jnp.asarray(cot), interpret=True, chunk=1,
        )
    )
    np.testing.assert_array_equal(tiled, untiled)

    # The custom VJP routes through the tiled path at this width; it must
    # still match the mirror's jax.grad exactly (same tolerance as the
    # untiled vjp tests above).
    scale = norm[:, (0, 1, 0, 1)]
    rois_fg = (rois * scale[:, None, :]).astype(np.float32)
    g_kernel = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                roi_pool_taps_pallas(
                    f, jnp.asarray(rois), jnp.asarray(norm), interpret=True,
                    chunk=1,
                )
                * cot
            )
        )(jnp.asarray(fm))
    )
    g_mirror = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                jnp.stack([taps_mirror(f[0], jnp.asarray(rois_fg[0]))]) * cot
            )
        )(jnp.asarray(fm))
    )
    np.testing.assert_allclose(g_kernel, g_mirror, rtol=1e-4, atol=1e-4)
