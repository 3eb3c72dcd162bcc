#!/usr/bin/env python
"""Hardware gradient check of the tap RoI kernel's custom VJP.

Runs on the real chip (Mosaic) at production-like shapes (B=4, P=128,
38x50x512 f32) and checks the Pallas backward kernel three ways:

1. Element-wise against jax.grad of an exact pure-jnp mirror of the taps
   formulation (same wy construction, same clamped two-tap x interpolation,
   same pooling order). This is the decisive check: the only legitimate
   disagreements are argmax flips on float near-ties, so the mismatch
   fraction must be ~0 (measured 4.9e-6 on v5e-1).
2. Against jax.grad of the einsum formulation (ops/roi.roi_pool_features):
   same function via a different float path, so near-tie flips are more
   common — a small mismatch fraction is expected and bounded.
3. Central finite differences at shrinking eps — REPORTED, NOT GATED: the
   pooled objective is piecewise linear with a dense set of max-pool kinks
   at these shapes, so FD carries an O(eps)-scaling kink-crossing bias.
   The evidence it is an FD artifact, not a VJP bug: the exact mirror's own
   XLA autodiff shows the same deviation (1.34e-2 vs the kernel's 1.39e-2
   at eps=1e-3 on v5e-1) and both shrink as eps does.

The interpret-mode twins of check 1 run in CI (tests/test_roi_pallas.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fasterrcnn_tpu.ops import roi as roi_ops
from fasterrcnn_tpu.ops.pallas.roi_pallas import roi_pool_taps_pallas

IMG_H, IMG_W = 600.0, 800.0
REAL_FH, REAL_FW = 37, 50
# C defaults to the VGG width; FRCNN_GRADCHECK_C=1024 covers the ResNet
# width (exercises the C>512 channel-tiled backward and the C=1024 forward
# chunk budget on real Mosaic — interpret-mode CI twins only go to 640).
B, H, W, C, P = 4, 38, 50, int(os.environ.get("FRCNN_GRADCHECK_C", "512")), 128
CROP, OUT = 14, 7


def random_rois(rng, n):
    y1 = rng.uniform(0, IMG_H * 0.8, n)
    x1 = rng.uniform(0, IMG_W * 0.8, n)
    y2 = y1 + rng.uniform(16, IMG_H * 0.4, n)
    x2 = x1 + rng.uniform(16, IMG_W * 0.4, n)
    return np.stack(
        [y1, x1, np.minimum(y2, IMG_H), np.minimum(x2, IMG_W)], 1
    ).astype(np.float32)


def mirror_one(fm_i, roi):
    """Exact jnp mirror of _roi_taps_kernel for one RoI (feature-grid coords)."""
    steps = jnp.arange(CROP, dtype=jnp.float32) / (CROP - 1)

    def interp(pos, size):
        lo = jnp.floor(pos)
        frac = pos - lo
        idx = jnp.arange(size, dtype=jnp.float32)
        sheet = jnp.where(idx == lo[:, None], 1.0 - frac[:, None], 0.0) + jnp.where(
            idx == lo[:, None] + 1.0, frac[:, None], 0.0
        )
        return sheet * ((pos >= 0.0) & (pos <= size - 1.0))[:, None]

    ys = roi[0] + (roi[2] - roi[0]) * steps
    xs = roi[1] + (roi[3] - roi[1]) * steps
    wy = interp(ys, H).astype(fm_i.dtype)
    rows = jnp.einsum("sh,hwc->swc", wy, fm_i, precision=jax.lax.Precision.HIGHEST)
    in_r = ((xs >= 0.0) & (xs <= W - 1.0)).astype(jnp.float32)
    xlo_f = jnp.clip(jnp.floor(xs), 0.0, W - 2.0)
    f = xs - xlo_f
    xlo = xlo_f.astype(jnp.int32)
    seg_lo = jnp.take(rows, xlo, axis=1)
    seg_hi = jnp.take(rows, xlo + 1, axis=1)
    col = (
        seg_lo * ((1.0 - f) * in_r)[None, :, None]
        + seg_hi * (f * in_r)[None, :, None]
    )
    yp = col.reshape(OUT, 2, CROP, C).max(axis=1)
    return yp.reshape(OUT, OUT, 2, C).max(axis=2)


def main():
    rng = np.random.default_rng(0)
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    rois = np.stack([random_rois(rng, P) for _ in range(B)])
    norm = np.tile(
        [[(REAL_FH - 1) / IMG_H, (REAL_FW - 1) / IMG_W]], (B, 1)
    ).astype(np.float32)
    cot = rng.normal(size=(B, P, OUT, OUT, C)).astype(np.float32)
    rois_fg = (rois * norm[:, (0, 1, 0, 1)][:, None, :]).astype(np.float32)

    @jax.jit
    def loss_kernel(fm_):
        o = roi_pool_taps_pallas(fm_, jnp.asarray(rois), jnp.asarray(norm))
        return jnp.sum(o * cot)

    @jax.jit
    def loss_mirror(fm_):
        o = jax.vmap(
            lambda f, r: jax.vmap(lambda rr: mirror_one(f, rr))(r)
        )(fm_, jnp.asarray(rois_fg))
        return jnp.sum(o * cot)

    @jax.jit
    def loss_einsum(fm_):
        def one(f, r):
            return roi_ops.roi_pool_features(
                f, r, IMG_H, IMG_W, 7,
                fm_height=float(REAL_FH), fm_width=float(REAL_FW),
            )
        return jnp.sum(jax.vmap(one)(fm_, jnp.asarray(rois)) * cot)

    print("forward: kernel %.6f mirror %.6f einsum %.6f" % (
        float(loss_kernel(jnp.asarray(fm))),
        float(loss_mirror(jnp.asarray(fm))),
        float(loss_einsum(jnp.asarray(fm))),
    ))

    g_k = np.asarray(jax.grad(loss_kernel)(jnp.asarray(fm)))

    # 1. Decisive: vs the exact mirror's autodiff.
    g_m = np.asarray(jax.grad(loss_mirror)(jnp.asarray(fm)))
    rel_m = np.abs(g_k - g_m) / np.maximum(np.abs(g_m), 1e-3)
    frac_m = (rel_m > 1e-2).mean()
    print("vs mirror:  frac(rel>1e-2) = %.2e" % frac_m)
    assert frac_m < 5e-5, frac_m

    # 2. Cross-formulation: vs the einsum path's autodiff.
    g_e = np.asarray(jax.grad(loss_einsum)(jnp.asarray(fm)))
    rel_e = np.abs(g_k - g_e) / np.maximum(np.abs(g_e), 1e-3)
    frac_e = (rel_e > 1e-2).mean()
    print("vs einsum:  frac(rel>1e-2) = %.2e" % frac_e)
    assert frac_e < 1e-3, frac_e

    # 3. FD scaling (informational — see module docstring).
    d = rng.normal(size=fm.shape).astype(np.float32)
    an = float(np.sum(g_k * d))
    for eps in (1e-3, 3e-4):
        lp = float(loss_kernel(jnp.asarray(fm + eps * d)))
        lm = float(loss_kernel(jnp.asarray(fm - eps * d)))
        fd = (lp - lm) / (2 * eps)
        print("fd eps %.0e: fd %.2f analytic %.2f rel %.2e (kink-bias, O(eps))"
              % (eps, fd, an, abs(fd - an) / abs(fd)))

    print("ROI VJP GRADCHECK OK")


if __name__ == "__main__":
    main()
