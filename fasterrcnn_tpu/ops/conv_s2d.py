"""Width-axis space-to-depth 3x3 conv: the MXU-shaped fix for low-C layers.

VGG's early convs are the backbone's MFU sink on TPU: at C=Cout=64
(block1's conv1_2) the conv's contraction depth K=C fills half the MXU's
128-deep systolic array AND Cout=64 fills half its output lanes, capping
utilization at 25% (hardware A/B measures XLA at 21%, i.e. 84% of that
cap — the emitter itself is fine, the shape is wrong). The same A/B shows
a hand-written Pallas im2col kernel is NOT the answer: building the
(T*W, 9C) patch matrix costs nine VPU relayouts per tile and loses to XLA
by 2x on block2 (ops/pallas/conv_pallas.py keeps that negative result).

The TPU-shaped rewrite is a LAYOUT change, not a kernel: pack adjacent
width pairs into channels (x: (B,H,W,C) -> (B,H,W/2,2C), a free reshape —
W is the minor spatial axis in NHWC so pairs are already contiguous), and
convolve THAT with a (3,3,2C,2Cout) kernel assembled from the original
(3,3,C,Cout) weights. Each packed output column holds both original
columns (ox in {0,1}); original column c = ox+dx lands in packed column
floor(c/2)+1, sub-column c mod 2, so every original tap appears exactly
once per ox and the rest of the packed kernel is structural zeros:

      packed (kx2, sx) <- original dx      ox=0        ox=1
          dx=-1                           (0, 1)      (1, 0)
          dx= 0                           (1, 0)      (1, 1)
          dx= 1                           (1, 1)      (2, 0)

Zero-padding stays consistent: XLA's SAME padding on the packed array
pads one packed column = TWO original columns per side, and the table
above shows the extra column's taps ((0,0) for ox=0, (2,1) for ox=1) are
exactly the structural zeros, so the result is bit-compatible with SAME
padding on the original layout (same f32 accumulation of the same nine
products; the interleaved zeros add exact 0.0).

Cost/benefit: K doubles per tap AND the padded kernel is half zeros, so
the conv does 2x the FLOPs of the original — but with K=9*2C (1152 for
C=64) and 2Cout=128 lanes both saturating the MXU. If the packed shape
reaches block3-like MFU (~78%) that is a ~1.9x layer speedup, pure XLA,
differentiable, no custom VJP needed (hardware numbers:
scripts/profile_conv.py "s2dw" rows).

Reference counterpart: none (cuDNN handles C=64 natively; this file
exists because the MXU's 128x128 shape does not).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//2, 2C); W must be even. Free on TPU: W is
    the sublane axis and C the lane axis, so adjacent (col, channel) pairs
    are already contiguous in the minor dims."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W2, 2C) -> (B, H, 2*W2, C)."""
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Cout) -> (3, 3, 2C, 2Cout) packed-width conv kernel.

    Channel layouts are sub-column-major on both sides — input lane block
    (sx, c), output lane block (ox, cout) — matching pack_width's reshape.
    """
    kh, kw, c, cout = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    z = jnp.zeros((3, 3, 2, c, 2, cout), w.dtype)
    # (kx2, sx, ox) <- dx placements derived in the module docstring.
    z = z.at[:, 0, 1, :, 0, :].set(w[:, 0])  # dx=-1, ox=0
    z = z.at[:, 1, 0, :, 0, :].set(w[:, 1])  # dx= 0, ox=0
    z = z.at[:, 1, 1, :, 0, :].set(w[:, 2])  # dx=+1, ox=0
    z = z.at[:, 1, 0, :, 1, :].set(w[:, 0])  # dx=-1, ox=1
    z = z.at[:, 1, 1, :, 1, :].set(w[:, 1])  # dx= 0, ox=1
    z = z.at[:, 2, 0, :, 1, :].set(w[:, 2])  # dx=+1, ox=1
    return z.reshape(3, 3, 2 * c, 2 * cout)


def conv3x3_s2dw(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    relu: bool = True,
) -> jnp.ndarray:
    """3x3 SAME stride-1 conv (+bias, optional fused ReLU), NHWC, computed
    in the width-packed layout. Drop-in numerical replacement for the
    direct lax conv; use for C <= 128 where the MXU runs underfilled."""
    out = conv3x3_s2dw_packed(pack_width(x), w, b, relu)
    return unpack_width(out)


def conv3x3_s2dw_packed(
    xp: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    relu: bool = True,
) -> jnp.ndarray:
    """Same, but input AND output stay in the packed (B, H, W/2, 2C)
    layout — lets consecutive low-C convs chain without repacking."""
    cout = w.shape[-1]
    out = jax.lax.conv_general_dilated(
        xp,
        pack_kernel(w),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    # bias per original channel, tiled over both packed sub-columns
    out = out + jnp.tile(b.astype(jnp.float32), 2)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(xp.dtype)


def maxpool2x2_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool consuming the packed layout, emitting the
    NORMAL layout at half resolution: max over the row pair and both
    packed sub-columns. (B, H, W2, 2C) -> (B, H/2, W2, C)."""
    bsz, h, w2, c2 = xp.shape
    c = c2 // 2
    v = xp.reshape(bsz, h // 2, 2, w2, 2, c)
    return v.max(axis=(2, 4))
