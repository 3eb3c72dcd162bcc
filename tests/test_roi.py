"""RoI feature extraction tests: crop_and_resize vs a NumPy bilinear oracle,
exact RoIPool vs a NumPy port of the torchvision quantization rules."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import roi as roi_ops


def crop_and_resize_oracle(fm, rois, img_h, img_w, crop):
    """Straightforward NumPy bilinear crop (tf.image.crop_and_resize rules)."""
    h, w, c = fm.shape
    p = rois.shape[0]
    out = np.zeros((p, crop, crop, c), np.float32)
    for i in range(p):
        y1, x1, y2, x2 = rois[i]
        y1 = y1 / img_h * (h - 1)
        y2 = y2 / img_h * (h - 1)
        x1 = x1 / img_w * (w - 1)
        x2 = x2 / img_w * (w - 1)
        for a in range(crop):
            ty = y1 + (y2 - y1) * a / (crop - 1)
            if ty < 0 or ty > h - 1:
                continue
            ylo = int(np.floor(ty))
            yfrac = ty - ylo
            for b in range(crop):
                tx = x1 + (x2 - x1) * b / (crop - 1)
                if tx < 0 or tx > w - 1:
                    continue
                xlo = int(np.floor(tx))
                xfrac = tx - xlo
                v = fm[ylo, xlo] * (1 - yfrac) * (1 - xfrac)
                if ylo + 1 <= h - 1:
                    v = v + fm[ylo + 1, xlo] * yfrac * (1 - xfrac)
                if xlo + 1 <= w - 1:
                    v = v + fm[ylo, xlo + 1] * (1 - yfrac) * xfrac
                if ylo + 1 <= h - 1 and xlo + 1 <= w - 1:
                    v = v + fm[ylo + 1, xlo + 1] * yfrac * xfrac
                out[i, a, b] = v
    return out


def roi_pool_oracle(fm, rois, spatial_scale, out_size):
    """NumPy port of torchvision RoIPool quantization (roi_pool_kernel.cpp)."""
    h, w, c = fm.shape
    p = rois.shape[0]

    def rnd(v):
        return int(np.floor(v + 0.5))

    out = np.zeros((p, out_size, out_size, c), np.float32)
    for i in range(p):
        y1 = rnd(rois[i, 0] * spatial_scale)
        x1 = rnd(rois[i, 1] * spatial_scale)
        y2 = rnd(rois[i, 2] * spatial_scale)
        x2 = rnd(rois[i, 3] * spatial_scale)
        rh = max(y2 - y1 + 1, 1)
        rw = max(x2 - x1 + 1, 1)
        bh = rh / out_size
        bw = rw / out_size
        for ph in range(out_size):
            hs = min(max(int(np.floor(bh * ph)) + y1, 0), h)
            he = min(max(int(np.ceil(bh * (ph + 1))) + y1, 0), h)
            for pw in range(out_size):
                ws = min(max(int(np.floor(bw * pw)) + x1, 0), w)
                we = min(max(int(np.ceil(bw * (pw + 1))) + x1, 0), w)
                if he <= hs or we <= ws:
                    continue  # empty bin -> 0
                out[i, ph, pw] = fm[hs:he, ws:we].max(axis=(0, 1))
    return out


def random_rois(rng, n, img_h, img_w):
    y1 = rng.uniform(0, img_h * 0.8, n)
    x1 = rng.uniform(0, img_w * 0.8, n)
    y2 = y1 + rng.uniform(16, img_h * 0.4, n)
    x2 = x1 + rng.uniform(16, img_w * 0.4, n)
    return np.stack(
        [y1, x1, np.minimum(y2, img_h), np.minimum(x2, img_w)], 1
    ).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_crop_and_resize_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    fm = rng.normal(size=(12, 16, 8)).astype(np.float32)
    rois = random_rois(rng, 20, 192, 256)
    got = np.asarray(
        roi_ops.crop_and_resize(jnp.asarray(fm), jnp.asarray(rois), 192.0, 256.0, 14)
    )
    want = crop_and_resize_oracle(fm, rois, 192.0, 256.0, 14)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_roi_pool_features_shape_and_maxpool():
    rng = np.random.default_rng(2)
    fm = rng.normal(size=(12, 16, 8)).astype(np.float32)
    rois = random_rois(rng, 10, 192, 256)
    pooled = np.asarray(
        roi_ops.roi_pool_features(jnp.asarray(fm), jnp.asarray(rois), 192.0, 256.0, 7)
    )
    crops = np.asarray(
        roi_ops.crop_and_resize(jnp.asarray(fm), jnp.asarray(rois), 192.0, 256.0, 14)
    )
    want = crops.reshape(10, 7, 2, 7, 2, 8).max(axis=(2, 4))
    np.testing.assert_allclose(pooled, want, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roi_pool_exact_matches_torchvision_rules(seed):
    rng = np.random.default_rng(seed)
    fm = rng.normal(size=(24, 32, 4)).astype(np.float32)
    rois = random_rois(rng, 25, 24 * 16, 32 * 16)
    got = np.asarray(
        roi_ops.roi_pool_exact(jnp.asarray(fm), jnp.asarray(rois), 1.0 / 16.0, 7)
    )
    want = roi_pool_oracle(fm, rois, 1.0 / 16.0, 7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_crop_and_resize_padded_canvas_alignment(seed):
    """A 600x620 image in a 608x800 bucket: crops from the padded-canvas
    feature map (with the real fm extent passed) must equal crops from the
    unpadded real feature map — the advisor-confirmed round-1 bug read
    zero-padding because positions were stretched by canvas/image."""
    rng = np.random.default_rng(seed)
    img_h, img_w = 600.0, 620.0
    real_fh, real_fw = 600 // 16, 620 // 16  # 37, 38 (VGG floor rule)
    canvas_fh, canvas_fw = 608 // 16, 800 // 16  # 38, 50
    real_fm = rng.normal(size=(real_fh, real_fw, 8)).astype(np.float32)
    canvas_fm = np.zeros((canvas_fh, canvas_fw, 8), np.float32)
    canvas_fm[:real_fh, :real_fw] = real_fm
    rois = random_rois(rng, 16, img_h, img_w)

    want = np.asarray(
        roi_ops.crop_and_resize(jnp.asarray(real_fm), jnp.asarray(rois), img_h, img_w, 14)
    )
    got = np.asarray(
        roi_ops.crop_and_resize(
            jnp.asarray(canvas_fm),
            jnp.asarray(rois),
            img_h,
            img_w,
            14,
            fm_height=float(real_fh),
            fm_width=float(real_fw),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_roi_pool_features_padded_canvas_alignment():
    """Same property through the full pool path (crop + 2x2 max), chunked."""
    rng = np.random.default_rng(7)
    img_h, img_w = 600.0, 620.0
    real_fh, real_fw = 37, 38
    real_fm = rng.normal(size=(real_fh, real_fw, 8)).astype(np.float32)
    canvas_fm = np.zeros((38, 50, 8), np.float32)
    canvas_fm[:real_fh, :real_fw] = real_fm
    rois = random_rois(rng, 32, img_h, img_w)
    want = np.asarray(
        roi_ops.roi_pool_features(jnp.asarray(real_fm), jnp.asarray(rois), img_h, img_w, 7)
    )
    got = np.asarray(
        roi_ops.roi_pool_features(
            jnp.asarray(canvas_fm),
            jnp.asarray(rois),
            img_h,
            img_w,
            7,
            roi_chunk=16,
            fm_height=float(real_fh),
            fm_width=float(real_fw),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_roi_pool_exact_halfpoint_rounding():
    # x * 1/16 landing exactly on .5 must round half-up like C++ round().
    fm = np.arange(20 * 20, dtype=np.float32).reshape(20, 20)[:, :, None]
    rois = np.array([[8.0, 8.0, 150.0, 150.0]], np.float32)  # 8/16 = 0.5 -> 1
    got = np.asarray(roi_ops.roi_pool_exact(jnp.asarray(fm), jnp.asarray(rois)))
    want = roi_pool_oracle(fm, rois, 1.0 / 16.0, 7)
    np.testing.assert_allclose(got, want)
