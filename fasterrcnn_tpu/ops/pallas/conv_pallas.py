"""Pallas implicit-GEMM 3x3 SAME conv for the VGG block4/5 hot layers.

Why this exists: the committed inference roofline (README "Benchmarks")
shows XLA's TPU conv codegen running the 512-channel 3x3 convs at ~61% MFU,
making the backbone the binding constraint at ~227 img/s vs a ~250 img/s
best-case. This kernel is the "one real swing" at that ceiling (VERDICT r3
Next #4): express the conv as 9 shifted MXU matmuls against VMEM-resident
weights — the same toolkit the RoI tap kernel proved out.

Formulation (per (image, row-tile) grid step):
  * the padded input block (T+2, W+2, C) is DMA'd HBM->VMEM manually
    (overlapping row windows are not expressible as a BlockSpec);
  * for each kx in 0..2: slice columns kx..kx+W and merge the leading dims
    to Y = (T+2)*W rows x C lanes — ONE relayout copy per kx instead of
    nine, because for fixed kx every ky tap is then a contiguous
    leading-dim slice Y[ky*W : ky*W + T*W];
  * accumulate 9 matmuls (T*W, C) @ (C, Cout-split) into f32 scratch,
    split over Cout so the accumulator + weights + block buffers fit VMEM;
  * fused bias + ReLU on the way out (VGG convs are all conv+ReLU).

The kernel is inference-grade: a custom VJP routes gradients through the
XLA conv primitives (same math, untouched training numerics), so wiring it
into the backbone changes no training behavior.

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
