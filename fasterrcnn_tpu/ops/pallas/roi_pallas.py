"""Fused RoI crop + 2x2 max-pool as a Pallas TPU kernel.

The TPU-native replacement for the reference's RoI feature extraction
(tf.image.crop_and_resize + tf.nn.max_pool, tf2/FasterRCNN/models/
detector.py:92-100; torchvision.ops.RoIPool is the exact-quantization
sibling served by ops/roi.roi_pool_exact). Semantics are identical to
ops/roi.roi_pool_features — the XLA einsum formulation is the oracle this
kernel is tested against (tests/test_roi_pallas.py).

Design: one grid step processes T RoIs of one image with the whole feature
map resident in VMEM. Bilinear interpolation weights are built on the VPU
from 2-D iota comparisons (one (T*14, H) y-weight sheet, one (T*14, W)
x-weight sheet), the y-contraction runs as a single (T*14, H) x (H, W, C)
MXU matmul, and the per-RoI x-contraction + fused 2x2 max-pool emit
(7, 7, C) tiles directly — the (P, 14, W, C) intermediate that dominates
the XLA path's HBM traffic never leaves VMEM.

Mosaic constraints honored (probed on hardware): only 2-D x 3-D
dot_general contracting the rhs leading dim computes correctly (the
middle-dim variant miscompiles), strided slicing lowers to unsupported
gathers (pooling uses leading-dim reshapes + transposes instead), scalars
(RoI corners) live in SMEM because Mosaic rejects scalar VMEM loads, and
SMEM blocks obey the same trailing-dims blocking rule as VMEM (each
program sees its image's full (P, 4) RoI table).

Two kernels live here:

  * roi_pool_taps_pallas — THE PRODUCTION PATH for inference AND training
    (wired into models/faster_rcnn.py's predict and train graphs on TPU):
    y-contraction as one plain 2-D MXU matmul into VMEM scratch, bilinear-x
    as its literal two taps via 128-aligned dynamic lane slices, fused 2x2
    pool. Measured 15.3 ms vs the XLA einsum path's 32.2 ms at
    B=32/P=300/38x50x512 bf16. A custom VJP (_roi_taps_bwd_kernel) makes it
    differentiable wrt the feature map: the backward kernel recomputes the
    row stage, splits the output cotangent across the 2x2 max-pool argmax
    window (a flat equal split among all ties — a valid mass-preserving
    subgradient that agrees with jnp reduce_max's hierarchical split except
    on partial ties, e.g. 3-way: 1/3 each vs 1/4,1/4,1/2; both subgradients
    train identically and ties only arise for degenerate RoIs with
    coincident samples),
    scatters it through the two bilinear x-taps into a row-cotangent
    scratch, and contracts back to the feature map with the transposed
    y-weight sheet. RoIs/norm receive zero cotangent by definition —
    proposals are training constants (reference detaches them,
    pytorch/FasterRCNN/models/faster_rcnn.py:331-333).
  * roi_pool_fused_pallas — the earlier all-matmul formulation, kept as a
    reference point: 84 ms at the same shapes. Its stage breakdown (weight
    sheets 1.7 ms, y-matmul +16 ms, transposes +0.4 ms, per-RoI
    x-contraction matmuls +34 ms) shows why: a dense W-contraction per RoI
    runs the MXU at (14/128)x(50/128) ~= 4% utilization — which is exactly
    what the tap formulation sidesteps by never materializing the dense
    x-weight matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roi_kernel(
    rois_ref,  # (1, P, 4) SMEM: corners in *feature-grid* coords
    fm_ref,  # (1, H, W, C) VMEM
    out_ref,  # (1, T, out, out, C) VMEM
    *,
    chunk: int,
    crop: int,
    out_size: int,
    precision,
):
    fm = fm_ref[0]  # (H, W, C)
    h, w, c = fm.shape
    dtype = fm.dtype
    t_s = chunk * crop
    base = pl.program_id(1) * chunk  # first RoI of this chunk

    def weight_sheet(size: int, corner_lo: int, corner_hi: int):
        """(T*crop, size) bilinear weights for all RoIs in the chunk.

        Row r = t*crop + s holds the interpolation weights of sample s of
        RoI t along this axis; column j is the source cell. Matches
        ops/roi._interp_weights: out-of-range samples contribute zero
        (crop_and_resize extrapolation_value=0 semantics).
        """
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, size), 0)
        step = (r_idx % crop).astype(jnp.float32) / float(crop - 1)
        pos = jnp.zeros((t_s, size), jnp.float32)
        for t in range(chunk):
            lo = rois_ref[0, base + t, corner_lo]
            hi = rois_ref[0, base + t, corner_hi]
            pos = jnp.where(r_idx // crop == t, lo + (hi - lo) * step, pos)
        # Mosaic iota is integer-only; cast for the float cell comparison.
        idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, size), 1).astype(
            jnp.float32
        )
        lo_cell = jnp.floor(pos)
        frac = pos - lo_cell
        sheet = jnp.where(idx == lo_cell, 1.0 - frac, 0.0) + jnp.where(
            idx == lo_cell + 1.0, frac, 0.0
        )
        in_range = (pos >= 0.0) & (pos <= float(size - 1))
        return (sheet * in_range).astype(dtype)

    wy = weight_sheet(h, 0, 2)  # (T*crop, H)
    wx = weight_sheet(w, 1, 3)  # (T*crop, W)

    # y-contraction for the whole chunk: (T*crop, H) x (H, W, C). Mosaic
    # requires a 32-bit matmul accumulator; the cast back to `dtype` bounds
    # the block's resident footprint on the bf16 path.
    rows = jax.lax.dot_general(
        wy,
        fm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(dtype)  # (T*crop, W, C)

    half = out_size  # crop == 2 * out_size
    for t in range(chunk):
        rows_t = jnp.transpose(
            rows[t * crop : (t + 1) * crop], (1, 0, 2)
        )  # (W, crop, C)
        crop_t = jax.lax.dot_general(
            wx[t * crop : (t + 1) * crop],
            rows_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(dtype)  # (crop_q, crop_s, C): q = x sample, s = y sample
        # Fused 2x2 max-pool via leading-dim reshapes (strided slices would
        # lower to unsupported gathers).
        a = jnp.max(crop_t.reshape(half, 2, crop, c), axis=1)  # (px, s, C)
        a = jnp.transpose(a, (1, 0, 2))  # (s, px, C)
        out_ref[0, t] = jnp.max(a.reshape(half, 2, half, c), axis=1)  # (py, px, C)


def _pick_chunk(
    p: int, h: int, w: int, c: int, itemsize: int, crop: int, out_size: int
) -> int:
    """Largest chunk whose VMEM footprint (fm + rows + temps + out) fits."""
    budget = 10 * 1024 * 1024
    fm_bytes = h * w * c * itemsize
    for t in (16, 12, 10, 8, 5, 4, 2, 1):
        # f32 matmul accumulator + the dtype copy it is cast into.
        rows_bytes = t * crop * w * c * (4 + itemsize)
        temps = 3 * crop * w * c * 4  # transpose + crop accum + pool slack
        out_bytes = t * out_size * out_size * c * itemsize
        if p % t == 0 and fm_bytes + rows_bytes + temps + out_bytes <= budget:
            return t
    return 1


def _roi_taps_kernel(
    rois_ref,  # (1, P, 4) SMEM: corners in *feature-grid* coords
    fm_ref,  # (1, H, W*C) VMEM (2-D flattened feature map)
    out_ref,  # (1, T, out, out, C) VMEM — in (px, py) order; wrapper swaps
    rows_ref,  # VMEM scratch (T*crop, W*C)
    *,
    chunk: int,
    crop: int,
    out_size: int,
    w: int,
    c: int,
    precision,
):
    """Tap-based variant: y-contraction as ONE plain 2-D matmul into VMEM
    scratch, then bilinear-x as two 128-aligned dynamic lane slices per
    output column (a bilinear kernel has only 2 taps — the dense W-matmul
    of the einsum formulation wastes 25x FLOPs at 4% MXU utilization)."""
    fm = fm_ref[0]  # (H, W*C)
    h = fm.shape[0]
    dtype = fm.dtype
    t_s = chunk * crop
    base = pl.program_id(1) * chunk

    # WY (T*crop, H) weight sheet (same construction as the matmul kernel).
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, h), 0)
    step = (r_idx % crop).astype(jnp.float32) / float(crop - 1)
    pos = jnp.zeros((t_s, h), jnp.float32)
    for t in range(chunk):
        lo = rois_ref[0, base + t, 0]
        hi = rois_ref[0, base + t, 2]
        pos = jnp.where(r_idx // crop == t, lo + (hi - lo) * step, pos)
    idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, h), 1).astype(jnp.float32)
    lo_cell = jnp.floor(pos)
    frac = pos - lo_cell
    wy = jnp.where(idx == lo_cell, 1.0 - frac, 0.0) + jnp.where(
        idx == lo_cell + 1.0, frac, 0.0
    )
    wy = (wy * ((pos >= 0.0) & (pos <= float(h - 1)))).astype(dtype)

    rows_ref[...] = jax.lax.dot_general(
        wy,
        fm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(dtype)  # (T*crop, W*C)

    for t in range(chunk):
        x1 = rois_ref[0, base + t, 1]
        x2 = rois_ref[0, base + t, 3]
        cols = []
        for q in range(crop):
            xs = x1 + (x2 - x1) * (q / (crop - 1))
            in_r = ((xs >= 0.0) & (xs <= float(w - 1))).astype(jnp.float32)
            # Clamp so the hi tap stays in bounds; xs == w-1 lands as
            # (lo = w-2, frac = 1) which reads column w-1 with weight 1.
            xlo_f = jnp.clip(jnp.floor(xs), 0.0, float(w - 2))
            f = xs - xlo_f
            xlo = xlo_f.astype(jnp.int32)
            seg_lo = rows_ref[pl.ds(t * crop, crop), pl.ds(xlo * c, c)]
            seg_hi = rows_ref[pl.ds(t * crop, crop), pl.ds((xlo + 1) * c, c)]
            col = (
                seg_lo * ((1.0 - f) * in_r).astype(dtype)
                + seg_hi * (f * in_r).astype(dtype)
            )  # (crop_s, C)
            # y-pool: max over adjacent sample pairs (static slices).
            cols.append(
                jnp.concatenate(
                    [
                        jnp.max(col[2 * i : 2 * i + 2], axis=0, keepdims=True)
                        for i in range(out_size)
                    ],
                    axis=0,
                )
            )  # (out, C)
        for px in range(out_size):
            # out is (px, py, C); the wrapper swaps back to (py, px, C).
            out_ref[0, t, px] = jnp.maximum(cols[2 * px], cols[2 * px + 1])


def _taps_precision(dtype):
    # The MXU's *default* f32 matmul uses bf16 passes — too lossy for
    # interpolation weights on the f32 parity path.
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _rois_to_feature_grid(rois, norm):
    """(B, P, 4) pixel-space corners -> f32 feature-grid corners."""
    scale = norm[:, (0, 1, 0, 1)]  # (B, 4) -> (sy, sx, sy, sx)
    return (rois.astype(jnp.float32) * scale[:, None, :]).astype(jnp.float32)


def _taps_fwd_impl(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    norm: jnp.ndarray,
    crop_size: int,
    out_size: int,
    interpret: bool,
    chunk: int,
) -> jnp.ndarray:
    b, h, w, c = feature_map.shape
    p = rois.shape[1]
    assert p % chunk == 0, (p, chunk)
    kernel = functools.partial(
        _roi_taps_kernel,
        chunk=chunk,
        crop=crop_size,
        out_size=out_size,
        w=w,
        c=c,
        precision=_taps_precision(feature_map.dtype),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, p // chunk),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, out_size, out_size, c),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, p, out_size, out_size, c), feature_map.dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((chunk * crop_size, w * c), feature_map.dtype)
        ],
        interpret=interpret,
    )(_rois_to_feature_grid(rois, norm), feature_map.reshape(b, h, w * c))
    return jnp.swapaxes(out, 2, 3)  # kernel emits (px, py, C)


def _roi_taps_bwd_kernel(
    rois_ref,  # (1, P, 4) SMEM: corners in feature-grid coords
    fm_ref,  # (1, H, W*C) VMEM
    g_ref,  # (1, T, out, out, C) VMEM — px-major (g[0, t, px, py])
    gfm_ref,  # (1, H, W*C) f32 VMEM out, accumulated across grid dim 1
    rows_ref,  # VMEM scratch (T*crop, W*C), fm dtype
    grows_ref,  # VMEM scratch (T*crop, W*C), f32 row cotangents
    *,
    chunk: int,
    crop: int,
    out_size: int,
    w: int,
    c: int,
    precision,
):
    """Backward of _roi_taps_kernel wrt the feature map.

    Recomputes the forward row stage (wy @ fm) to recover the pre-pool
    column values, splits each output cotangent equally among the argmax
    ties of its 2x2 (y-sample, x-sample) window — the same subgradient jnp
    reduce_max defines — pushes it through the two bilinear x-taps into a
    f32 row-cotangent scratch, and finishes with gfm += wy^T @ grows.
    """
    fm = fm_ref[0]  # (H, W*C)
    h = fm.shape[0]
    dtype = fm.dtype
    t_s = chunk * crop
    base = pl.program_id(1) * chunk

    # WY weight sheet: identical construction to the forward kernel so the
    # recomputed rows match bit-for-bit (argmax decisions depend on them).
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, h), 0)
    step = (r_idx % crop).astype(jnp.float32) / float(crop - 1)
    pos = jnp.zeros((t_s, h), jnp.float32)
    for t in range(chunk):
        lo = rois_ref[0, base + t, 0]
        hi = rois_ref[0, base + t, 2]
        pos = jnp.where(r_idx // crop == t, lo + (hi - lo) * step, pos)
    idx = jax.lax.broadcasted_iota(jnp.int32, (t_s, h), 1).astype(jnp.float32)
    lo_cell = jnp.floor(pos)
    frac = pos - lo_cell
    wy = jnp.where(idx == lo_cell, 1.0 - frac, 0.0) + jnp.where(
        idx == lo_cell + 1.0, frac, 0.0
    )
    wy = (wy * ((pos >= 0.0) & (pos <= float(h - 1)))).astype(dtype)

    rows_ref[...] = jax.lax.dot_general(
        wy,
        fm,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(dtype)
    grows_ref[...] = jnp.zeros(grows_ref.shape, grows_ref.dtype)

    for t in range(chunk):
        x1 = rois_ref[0, base + t, 1]
        x2 = rois_ref[0, base + t, 3]
        for px in range(out_size):
            # Recompute the two pre-pool columns of this output column.
            cols = []
            taps = []
            for q in (2 * px, 2 * px + 1):
                xs = x1 + (x2 - x1) * (q / (crop - 1))
                in_r = ((xs >= 0.0) & (xs <= float(w - 1))).astype(jnp.float32)
                xlo_f = jnp.clip(jnp.floor(xs), 0.0, float(w - 2))
                f = xs - xlo_f
                xlo = xlo_f.astype(jnp.int32)
                w_lo = ((1.0 - f) * in_r).astype(dtype)
                w_hi = (f * in_r).astype(dtype)
                seg_lo = rows_ref[pl.ds(t * crop, crop), pl.ds(xlo * c, c)]
                seg_hi = rows_ref[pl.ds(t * crop, crop), pl.ds((xlo + 1) * c, c)]
                col = seg_lo * w_lo + seg_hi * w_hi  # (crop_s, C)
                cols.append(col.reshape(out_size, 2, c))
                taps.append((xlo, w_lo, w_hi))
            # Mosaic's cmpf has no bf16 lowering on this target; the cast to
            # f32 is exact, so equality (the argmax decision) is unchanged.
            va = cols[0].astype(jnp.float32)
            vb = cols[1].astype(jnp.float32)
            outv = jnp.maximum(jnp.max(va, axis=1), jnp.max(vb, axis=1))
            eq_a = (va == outv[:, None]).astype(jnp.float32)
            eq_b = (vb == outv[:, None]).astype(jnp.float32)
            cnt = jnp.sum(eq_a, axis=1) + jnp.sum(eq_b, axis=1)  # (out, C) >= 1
            gshare = g_ref[0, t, px].astype(jnp.float32) / cnt  # (out_py, C)
            for eq, (xlo, w_lo, w_hi) in zip((eq_a, eq_b), taps):
                gcol = (eq * gshare[:, None]).reshape(crop, c)  # f32
                # Sequential read-modify-writes: adjacent x-samples often
                # share a tap column, so accumulation order matters.
                cur = grows_ref[pl.ds(t * crop, crop), pl.ds(xlo * c, c)]
                grows_ref[pl.ds(t * crop, crop), pl.ds(xlo * c, c)] = (
                    cur + gcol * w_lo.astype(jnp.float32)
                )
                cur = grows_ref[pl.ds(t * crop, crop), pl.ds((xlo + 1) * c, c)]
                grows_ref[pl.ds(t * crop, crop), pl.ds((xlo + 1) * c, c)] = (
                    cur + gcol * w_hi.astype(jnp.float32)
                )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        gfm_ref[...] = jnp.zeros(gfm_ref.shape, gfm_ref.dtype)

    gfm_ref[...] += jax.lax.dot_general(
        wy.astype(jnp.float32),
        grows_ref[...],
        (((0,), (0,)), ((), ())),  # contract the T*crop rows: wy^T @ grows
        preferred_element_type=jnp.float32,
        precision=precision,
    )[None]


def roi_pool_taps_pallas_bwd(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    norm: jnp.ndarray,
    g: jnp.ndarray,
    crop_size: int = 14,
    out_size: int = 7,
    interpret: bool = False,
    chunk: int = 0,
) -> jnp.ndarray:
    """Feature-map cotangent of roi_pool_taps_pallas; g is (B,P,out,out,C)."""
    b, h, w, c = feature_map.shape
    p = rois.shape[1]
    assert crop_size == 2 * out_size, (crop_size, out_size)
    assert c % 128 == 0, f"channels {c} must be a multiple of 128"
    if c > 512 and chunk <= 0:
        # Channel-tile wide feature maps into <=512-channel slices and run
        # the kernel per tile. The kernel is per-channel independent, so
        # this is exact; it exists because the C=1024 (ResNet) whole-width
        # call is at the mercy of Mosaic's scoped-vmem accounting: at
        # production shapes (38x50, P=128) the same chunk-1 program
        # compiled at <=16 MB inside one train graph but was accounted
        # 28.16M (full block double-buffering) inside another (r4: the
        # --train-all ResNet-101 step), an OOM. At 512 channels the
        # worst-case fully-double-buffered footprint is ~14 MB — safe under
        # either accounting. Cost: one extra HBM pass over fm/g/gfm for the
        # slices (~0.5 ms against the ~4 ms kernel at these shapes).
        ct = max(t for t in range(128, 513, 128) if c % t == 0)
        parts = [
            roi_pool_taps_pallas_bwd(
                feature_map[..., i : i + ct],
                rois,
                norm,
                g[..., i : i + ct],
                crop_size,
                out_size,
                interpret,
                chunk,
            )
            for i in range(0, c, ct)
        ]
        return jnp.concatenate(parts, axis=-1)
    itemsize = feature_map.dtype.itemsize
    if chunk <= 0:
        # Fixed residents: fm block + f32 gfm out block + the f32 transient
        # of the final dot; per-chunk: rows (dtype) + grows (f32) + g block.
        # Chunk 1 is the only pick that compiles INSIDE the real train
        # step: Mosaic's 16 MB scoped-vmem stack accounts ~2.3 MB higher
        # in-graph than for a standalone pallas_call (hardware-measured:
        # chunk 4 runs standalone at 3.73 ms vs 5.18 at chunk 1, but the
        # packed train step fails compile at 19.96M/16M with chunk 4 and
        # 16.44M/16M even with chunk 2). Do not raise this without
        # re-running /tmp-style probes of the REAL packed step on hardware.
        budget = 13 * 1024 * 1024
        fixed = h * w * c * (itemsize + 4 + 4)
        per = crop_size * w * c * (itemsize + 4) + out_size * out_size * c * itemsize
        chunk = next(
            (t for t in (8, 6, 5, 4, 3, 2, 1) if p % t == 0 and fixed + t * per <= budget),
            1,
        )
    assert p % chunk == 0, (p, chunk)
    kernel = functools.partial(
        _roi_taps_bwd_kernel,
        chunk=chunk,
        crop=crop_size,
        out_size=out_size,
        w=w,
        c=c,
        precision=_taps_precision(feature_map.dtype),
    )
    gfm = pl.pallas_call(
        kernel,
        grid=(b, p // chunk),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, chunk, out_size, out_size, c),
                lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w * c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((chunk * crop_size, w * c), feature_map.dtype),
            pltpu.VMEM((chunk * crop_size, w * c), jnp.float32),
        ],
        interpret=interpret,
    )(
        _rois_to_feature_grid(rois, norm),
        feature_map.reshape(b, h, w * c),
        jnp.swapaxes(g, 2, 3),  # kernel wants px-major, matching forward
    )
    return gfm.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _taps_custom(crop_size: int, out_size: int, interpret: bool, chunk: int):
    """custom_vjp-wrapped tap kernel for one static configuration."""

    @jax.custom_vjp
    def f(fm, rois, norm):
        return _taps_fwd_impl(fm, rois, norm, crop_size, out_size, interpret, chunk)

    def fwd(fm, rois, norm):
        return f(fm, rois, norm), (fm, rois, norm)

    def bwd(res, g):
        fm, rois, norm = res
        gfm = roi_pool_taps_pallas_bwd(
            fm, rois, norm, g, crop_size, out_size, interpret
        )
        # RoIs/norm cotangents are zero BY DEFINITION, not approximation:
        # proposals are constants of the training step (the reference
        # detaches them, faster_rcnn.py:331-333; our train graph
        # stop-gradients samples.boxes before detect_rois).
        return gfm.astype(fm.dtype), jnp.zeros_like(rois), jnp.zeros_like(norm)

    f.defvjp(fwd, bwd)
    return f


def roi_pool_taps_pallas(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    norm: jnp.ndarray,
    crop_size: int = 14,
    out_size: int = 7,
    interpret: bool = False,
    chunk: int = 0,
) -> jnp.ndarray:
    """Tap-based fused bilinear crop + 2x2 max-pool (see _roi_taps_kernel).

    Same contract as roi_pool_fused_pallas. Requires the channel count to be
    a multiple of 128 (dynamic lane slices must be 128-aligned).
    Differentiable wrt feature_map via a Pallas backward kernel
    (_roi_taps_bwd_kernel); rois/norm receive zero cotangent.
    """
    b, h, w, c = feature_map.shape
    p = rois.shape[1]
    assert crop_size == 2 * out_size, (crop_size, out_size)
    assert c % 128 == 0, f"channels {c} must be a multiple of 128"
    if chunk <= 0 and c * feature_map.dtype.itemsize > 2048:
        # Channel-tile wide-and-deep feature maps (f32 at C=1024 OOMs the
        # Mosaic 16 MB scoped-vmem stack at 18.75M even at chunk 1 —
        # hardware-measured via scripts/gradcheck_roi_vjp.py). 2048 bytes
        # per channel-row is the proven envelope: bf16/1024 (ResNet train
        # path) and f32/512 (VGG f32) both compile and run untiled on
        # hardware and stay that way. Exact: the kernel is per-channel
        # independent.
        ct = max(
            t
            for t in range(128, c, 128)
            if c % t == 0 and t * feature_map.dtype.itemsize <= 2048
        )
        outs = [
            roi_pool_taps_pallas(
                feature_map[..., i : i + ct],
                rois,
                norm,
                crop_size,
                out_size,
                interpret,
                chunk,
            )
            for i in range(0, c, ct)
        ]
        return jnp.concatenate(outs, axis=-1)
    if chunk <= 0:
        # Budget: fm block + rows scratch + the f32 matmul transient + the
        # output block this grid step writes. Hardware-calibrated, not
        # first-principles: the binding resource is Mosaic's 16 MB scoped
        # vmem STACK, whose accounting doesn't match a simple sum. Observed
        # on v5e-1 at 38x50 bf16: C=512 compiles and runs through chunk 12
        # (10 fastest, 15.1 ms vs 15.8 at 4); C=1024 (ResNet) FAILS compile
        # at chunk 5 (16.35 M stack vs the 16 M limit) while chunk 1-2 run.
        # The split budget reproduces exactly those known-good picks.
        budget = (24 if c <= 512 else 12) * 1024 * 1024
        itemsize = feature_map.dtype.itemsize
        fm_bytes = h * w * c * itemsize
        per = crop_size * w * c * (itemsize + 4) + out_size * out_size * c * itemsize
        chunk = next(
            (
                t
                for t in (12, 10, 8, 6, 5, 4, 3, 2, 1)
                if p % t == 0 and fm_bytes + t * per <= budget
            ),
            1,
        )
    return _taps_custom(crop_size, out_size, interpret, chunk)(
        feature_map, rois, norm
    )


@functools.partial(
    jax.jit, static_argnames=("crop_size", "out_size", "interpret", "chunk")
)
def roi_pool_fused_pallas(
    feature_map: jnp.ndarray,
    rois: jnp.ndarray,
    norm: jnp.ndarray,
    crop_size: int = 14,
    out_size: int = 7,
    interpret: bool = False,
    chunk: int = 0,
) -> jnp.ndarray:
    """Batched fused bilinear crop + 2x2 max-pool.

    Args:
      feature_map: (B, H, W, C) canvas feature maps.
      rois: (B, P, 4) boxes (y1, x1, y2, x2) in image-pixel coordinates.
      norm: (B, 2) per-image pixel->feature-grid factors
        ((real_fm_h - 1) / img_h, (real_fm_w - 1) / img_w).
      crop_size: bilinear sample grid side (2 * out_size).
      out_size: pooled output side.

    Returns:
      (B, P, out_size, out_size, C) pooled features, feature_map dtype.
    """
    b, h, w, c = feature_map.shape
    p = rois.shape[1]
    assert crop_size == 2 * out_size, (crop_size, out_size)
    if chunk <= 0:
        chunk = _pick_chunk(
            p, h, w, c, feature_map.dtype.itemsize, crop_size, out_size
        )
    assert p % chunk == 0, (p, chunk)
    precision = (
        jax.lax.Precision.HIGHEST
        if feature_map.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # Pre-scale corners to feature-grid coordinates so the kernel needs no
    # per-image scalars beyond the RoI table itself.
    scale = norm[:, (0, 1, 0, 1)]  # (B, 4) -> (sy, sx, sy, sx)
    rois_fg = (rois.astype(jnp.float32) * scale[:, None, :]).astype(jnp.float32)
    kernel = functools.partial(
        _roi_kernel,
        chunk=chunk,
        crop=crop_size,
        out_size=out_size,
        precision=precision,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, p // chunk),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, out_size, out_size, c),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, p, out_size, out_size, c), feature_map.dtype
        ),
        interpret=interpret,
    )(rois_fg, feature_map)
