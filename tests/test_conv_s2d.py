"""Width-packed (space-to-depth) conv parity vs the direct XLA conv.

The packed rewrite must be a drop-in numerical replacement for
lax.conv_general_dilated SAME — same nine products per output, f32
accumulation, interleaved structural zeros adding exact 0.0 — so parity
here is tight (the only slack is accumulation order inside the MXU dot).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fasterrcnn_tpu.ops.conv_s2d import (
    conv3x3_s2dw,
    conv3x3_s2dw_packed,
    maxpool2x2_packed,
    pack_kernel,
    pack_width,
    unpack_width,
)


def direct(x, w, b, relu=True):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    out = out + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


@pytest.mark.parametrize(
    "h,w,c,cout",
    [(8, 16, 8, 8), (16, 24, 4, 12), (6, 10, 16, 8)],
)
def test_matches_direct_conv_f32(h, w, c, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    got = conv3x3_s2dw(x, wk, b, relu=True)
    want = direct(x, wk, b, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_matches_direct_conv_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 8)), jnp.bfloat16)
    wk = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    got = conv3x3_s2dw(x, wk, b, relu=False)
    want = direct(x, wk, b, relu=False)
    # bf16 inputs, f32 accumulate: identical products, order-only slack.
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 4, 10, 5)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(unpack_width(pack_width(x))), np.asarray(x)
    )


def test_pack_kernel_density():
    # exactly 9 of 18 (kx2, sx) tap cells per output sub-column are live
    wk = jnp.ones((3, 3, 4, 6), jnp.float32)
    pk = np.asarray(pack_kernel(wk))
    assert pk.shape == (3, 3, 8, 12)
    assert np.count_nonzero(pk) == pk.size // 2


def test_packed_chain_matches_direct_chain():
    """Two convs + pool entirely in the packed domain == direct pipeline
    (VGG block1's exact structure: conv-relu, conv-relu, 2x2 maxpool)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 6)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 6, 8)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((8,)), jnp.float32)

    xp = pack_width(x)
    yp = conv3x3_s2dw_packed(xp, w1, b1, relu=True)
    yp = conv3x3_s2dw_packed(yp, w2, b2, relu=True)
    got = maxpool2x2_packed(yp)

    y = direct(x, w1, b1, relu=True)
    y = direct(y, w2, b2, relu=True)
    want = jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vgg16_packed_block1_matches_direct(monkeypatch):
    """The packed-block1 VGG path is a drop-in for the direct path: same
    params, same features (up to f32 accumulation order)."""
    from fasterrcnn_tpu.models.vgg16 import VGG16FeatureExtractor

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    model = VGG16FeatureExtractor(dtype="float32")
    params = model.init(jax.random.key(0), x)

    got = model.apply(params, x)
    monkeypatch.setenv("FRCNN_PACKED_BLOCK1", "0")
    want = model.apply(params, x)
    assert got.shape == want.shape == (1, 2, 3, 512)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_vgg16_packed_block1_param_tree_unchanged(monkeypatch):
    """Both paths must declare the identical parameter tree (the weight
    import / checkpoint / frozen-mask contract)."""
    from fasterrcnn_tpu.models.vgg16 import VGG16FeatureExtractor

    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    model = VGG16FeatureExtractor(dtype="float32")
    p_packed = model.init(jax.random.key(0), x)
    monkeypatch.setenv("FRCNN_PACKED_BLOCK1", "0")
    p_direct = model.init(jax.random.key(0), x)
    sp = jax.tree.structure(p_packed)
    sd = jax.tree.structure(p_direct)
    assert sp == sd
    for a, b in zip(jax.tree.leaves(p_packed), jax.tree.leaves(p_direct)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_match_direct():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 4)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((4,)), jnp.float32)

    def loss_packed(wk, b):
        return conv3x3_s2dw(x, wk, b, relu=True).sum()

    def loss_direct(wk, b):
        return direct(x, wk, b, relu=True).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1))(wk, b)
    gd = jax.grad(loss_direct, argnums=(0, 1))(wk, b)
    for a, c in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)
