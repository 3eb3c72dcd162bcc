"""Pallas implicit-GEMM 3x3 SAME convs for the VGG backbone hot layers.

Two kernels, two regimes (hardware A/B via scripts/profile_conv.py):

  * conv3x3_pallas — 9 shifted MXU matmuls with K = C contraction. Built
    as the "one real swing" at what round 3's stage profile called a 61%
    conv-MFU ceiling; the A/B showed that number was a measurement
    artifact: with chained-dispatch timing XLA's own conv emitter runs the
    C>=256 layers at 78-92% MFU and BEATS this kernel (71-77%). Kept as
    the measured negative result and the scaffolding the im2col variant
    reuses.
  * conv3x3_im2col_pallas — second swing, also a measured NEGATIVE
    result: for LOW-channel layers (C=64/128) a per-tap K=C matmul
    underfills the MXU's 128-deep contraction (XLA measures 21% MFU on
    block1's C=64, 65% on block2's C=128), so this kernel concatenates
    all nine taps into one (T*WP, 9C) patch matrix and runs ONE matmul
    with K = 9C (576/1152), filling the contraction dimension. On
    hardware the patch-matrix build (nine lane-offset relayouts per tile,
    pure VPU work on 9x the data) dominates: 8.2 ms vs XLA's 4.5 on
    block2, and block1 fails Mosaic compilation outright. The fix that
    actually lands is not a kernel at all — the width-packed layout
    rewrite in ops/conv_s2d.py, which feeds XLA's own high-MFU conv
    emitter an MXU-shaped problem.

Shared formulation (per (image, row-tile) grid step):
  * the padded input block (T+2, WP, C) is DMA'd HBM->VMEM manually
    (overlapping row windows are not expressible as a BlockSpec); WP is
    W+2 rounded up to the sublane tile (8) because Mosaic requires
    8-aligned sublane slices;
  * kx taps are sublane ROTATES (through f32 — the rotate is 32-bit-only),
    ky taps are aligned leading-dim slices after a (T+2, WP, C) ->
    ((T+2)*WP, C) merge;
  * f32 accumulation, fused bias + ReLU on the way out (VGG convs are all
    conv+ReLU); junk columns >= W are sliced off outside the kernel.

Both kernels are inference-grade: a custom VJP routes gradients through
the XLA conv primitives (same math, untouched training numerics), so
wiring them into the backbone changes no training behavior.

Reference counterpart: none (the reference uses cuDNN via torch; this file
races XLA's own conv emitter, see BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_row_tile(h: int) -> int:
    """Largest divisor of h with tile*W comfortably into the MXU and the
    (T+2, W+2, C) staging block small; hardware-swept on 608x800 shapes."""
    for t in (19, 16, 8, 4, 2, 1):
        if h % t == 0:
            return t
    return 1


def _conv_kernel(
    x_hbm,  # (B, H+2, WP, C) bf16, HBM (manual DMA); WP = W+2 padded to 8
    w_ref,  # (3, 3, C, Cout) VMEM
    b_ref,  # (1, Cout) VMEM
    out_ref,  # (1, T, WP, Cout) VMEM (cols >= W are junk, sliced outside)
    xbuf,  # (T+2, WP, C) VMEM scratch
    sem,
    *,
    tile: int,
    w_pad: int,
    cout_split: int,
    relu: bool,
    interpret: bool,
):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    c = x_hbm.shape[-1]
    cout = w_ref.shape[-1]
    t, wp = tile, w_pad

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t, t + 2)], xbuf, sem
    )
    dma.start()
    dma.wait()

    # The W axis lives in SUBLANES of the (WP, C) tile, so a kx window
    # cannot be sliced (Mosaic requires 8-aligned sublane slices; W+2 is
    # not a multiple of 8). Instead the block stays full padded width and
    # each kx tap is a sublane ROTATE: shifted[j] = x[j + kx]. Wraparound
    # lands only in output columns >= W, which the caller slices off.
    x_full = xbuf[...]
    n_splits = cout // cout_split
    for si in range(n_splits):
        acc = jnp.zeros((t * wp, cout_split), jnp.float32)
        for kx in range(3):
            if kx == 0:
                shifted = x_full
            elif interpret:
                shifted = jnp.roll(x_full, -kx, axis=1)
            else:
                # == jnp.roll(x, -kx): express as a positive static shift.
                # The sublane rotate is only implemented for 32-bit data
                # (bf16 packs 2 values per sublane row, and an odd shift
                # would split the pairs), so round-trip through f32 —
                # exact, and VPU-cheap next to the nine matmuls.
                shifted = pltpu.roll(
                    x_full.astype(jnp.float32), wp - kx, 1
                ).astype(x_full.dtype)
            # One relayout per kx: (T+2, WP, C) -> ((T+2)*WP, C); every ky
            # tap below is then an ALIGNED contiguous leading-dim slice
            # (offsets and sizes are multiples of WP, itself a multiple
            # of the sublane tile).
            y = shifted.reshape((t + 2) * wp, c)
            for ky in range(3):
                acc = acc + jnp.dot(
                    y[ky * wp : ky * wp + t * wp],
                    w_ref[ky, kx, :, si * cout_split : (si + 1) * cout_split],
                    preferred_element_type=jnp.float32,
                )
        acc = acc + b_ref[0, si * cout_split : (si + 1) * cout_split].astype(
            jnp.float32
        )
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, :, :, si * cout_split : (si + 1) * cout_split] = acc.reshape(
            t, wp, cout_split
        ).astype(out_ref.dtype)


def _conv3x3_fwd(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    relu: bool,
    tile: int | None,
    cout_split: int | None,
    interpret: bool,
) -> jnp.ndarray:
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    t = tile or _pick_row_tile(h)
    cs = cout_split or min(cout, 256)
    # W+2 rounded up to the sublane tile (8): sublane slices/rotates and
    # the leading-dim merge inside the kernel all require 8-alignment.
    wp = -(-(wd + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    kern = functools.partial(
        _conv_kernel, tile=t, w_pad=wp, cout_split=cs, relu=relu,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, wp, cout),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w, b.reshape(1, cout))
    return out[:, :, :wd, :]


def _xla_conv3x3(x, w, b, relu):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def conv3x3_pallas(x, w, b, relu=True, tile=None, cout_split=None,
                   interpret=False):
    """3x3 SAME-padding stride-1 conv (+bias, optional fused ReLU), NHWC.

    Forward runs the Pallas implicit-GEMM kernel; gradients fall back to
    the XLA conv graph (identical math up to f32-accumulator rounding), so
    the kernel is safe under jax.grad.
    """
    return _conv3x3_fwd(x, w, b, relu, tile, cout_split, interpret)


def _fwd(x, w, b, relu, tile, cout_split, interpret):
    out = _conv3x3_fwd(x, w, b, relu, tile, cout_split, interpret)
    return out, (x, w, b, out)


def _bwd(relu, tile, cout_split, interpret, res, g):
    x, w, b, out = res

    def ref(x, w, b):
        return _xla_conv3x3(x, w, b, relu)

    _, vjp = jax.vjp(ref, x, w, b)
    return vjp(g)


conv3x3_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# im2col variant: one K = 9C matmul per tile, for the C=64/128 layers
# ---------------------------------------------------------------------------


def _im2col_kernel(
    x_hbm,  # (B, H+2, WP, C) bf16, HBM (manual DMA)
    w_ref,  # (9C, Cout) VMEM — kx-major tap order (see _im2col_weights)
    b_ref,  # (1, Cout) VMEM
    out_ref,  # (1, T, WP, Cout) VMEM (cols >= W are junk, sliced outside)
    xbuf,  # (T+2, WP, C) VMEM scratch
    sem,
    *,
    tile: int,
    w_pad: int,
    relu: bool,
    interpret: bool,
):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    c = x_hbm.shape[-1]
    cout = w_ref.shape[-1]
    t, wp = tile, w_pad

    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t, t + 2)], xbuf, sem
    )
    dma.start()
    dma.wait()

    x_full = xbuf[...]
    taps = []
    for kx in range(3):
        if kx == 0:
            shifted = x_full
        elif interpret:
            shifted = jnp.roll(x_full, -kx, axis=1)
        else:
            shifted = pltpu.roll(
                x_full.astype(jnp.float32), wp - kx, 1
            ).astype(x_full.dtype)
        for ky in range(3):
            taps.append(shifted[ky : ky + t])  # (T, WP, C)
    # Patch matrix: lanes hold all nine taps' channels; the single matmul
    # contracts K = 9C (576 for C=64, 1152 for C=128), filling the MXU's
    # contraction depth where a per-tap K=C matmul leaves it 50-75% idle.
    y = jnp.concatenate(taps, axis=-1).reshape(t * wp, 9 * c)
    acc = jnp.dot(y, w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(t, wp, cout).astype(out_ref.dtype)


def _im2col_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Cout) -> (9C, Cout), kx-major to match the kernel's tap
    order (kx outer loop, ky inner): row block kx*3+ky holds w[ky, kx]."""
    return jnp.transpose(w, (1, 0, 2, 3)).reshape(-1, w.shape[-1])


def _pick_im2col_tile(h: int) -> int:
    """The (T*WP, 9C) patch matrix dominates VMEM; T=4 keeps it under
    ~4 MB for both target shapes (608x800x64, 304x400x128)."""
    for t in (4, 2, 1):
        if h % t == 0:
            return t
    return 1


def _conv3x3_im2col_fwd(x, w, b, relu, tile, interpret):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    t = tile or _pick_im2col_tile(h)
    wp = -(-(wd + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - wd - 1), (0, 0)))
    kern = functools.partial(
        _im2col_kernel, tile=t, w_pad=wp, relu=relu, interpret=interpret
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, wp, cout),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, _im2col_weights(w), b.reshape(1, cout))
    return out[:, :, :wd, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_im2col_pallas(x, w, b, relu=True, tile=None, interpret=False):
    """3x3 SAME stride-1 conv (+bias, optional fused ReLU), NHWC, tuned
    for low channel counts (C=64/128: VGG blocks 1-2).

    Forward runs the single-matmul im2col Pallas kernel; gradients fall
    back to the XLA conv graph, so it is safe under jax.grad.
    """
    return _conv3x3_im2col_fwd(x, w, b, relu, tile, interpret)


def _im2col_vjp_fwd(x, w, b, relu, tile, interpret):
    out = _conv3x3_im2col_fwd(x, w, b, relu, tile, interpret)
    return out, (x, w, b)


def _im2col_vjp_bwd(relu, tile, interpret, res, g):
    x, w, b = res

    def ref(x, w, b):
        return _xla_conv3x3(x, w, b, relu)

    _, vjp = jax.vjp(ref, x, w, b)
    return vjp(g)


conv3x3_im2col_pallas.defvjp(_im2col_vjp_fwd, _im2col_vjp_bwd)
