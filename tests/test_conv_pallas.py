"""Interpret-mode parity tests for the Pallas implicit-GEMM 3x3 conv."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops.pallas import conv_pallas


def _rand(shape, seed, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, shape), dtype)


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("tile,cout_split", [(4, 64), (2, 128)])
def test_conv3x3_matches_xla(relu, tile, cout_split):
    x = _rand((2, 8, 10, 128), 0)
    w = _rand((3, 3, 128, 128), 1) * 0.05
    b = _rand((128,), 2)
    got = conv_pallas.conv3x3_pallas(
        x, w, b, relu, tile, cout_split, True
    )
    want = conv_pallas._xla_conv3x3(x, w, b, relu)
    # bf16 inputs, f32 accumulation both sides; identical tap order is not
    # guaranteed, so allow last-ulp bf16 differences.
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0.02,
        atol=0.02,
    )


def test_conv3x3_f32_tight():
    x = _rand((1, 8, 10, 128), 3, jnp.float32)
    w = _rand((3, 3, 128, 128), 4, jnp.float32) * 0.05
    b = _rand((128,), 5, jnp.float32)
    got = conv_pallas.conv3x3_pallas(x, w, b, True, 4, 128, True)
    want = conv_pallas._xla_conv3x3(x, w, b, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("cin,cout", [(64, 64), (64, 128), (128, 128)])
def test_conv3x3_im2col_matches_xla(relu, cin, cout):
    x = _rand((2, 8, 10, cin), 0)
    w = _rand((3, 3, cin, cout), 1) * 0.05
    b = _rand((cout,), 2)
    got = conv_pallas.conv3x3_im2col_pallas(x, w, b, relu, 4, True)
    want = conv_pallas._xla_conv3x3(x, w, b, relu)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0.02,
        atol=0.02,
    )


def test_conv3x3_im2col_f32_tight():
    x = _rand((1, 8, 10, 64), 3, jnp.float32)
    w = _rand((3, 3, 64, 64), 4, jnp.float32) * 0.05
    b = _rand((64,), 5, jnp.float32)
    got = conv_pallas.conv3x3_im2col_pallas(x, w, b, True, 2, True)
    want = conv_pallas._xla_conv3x3(x, w, b, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_im2col_grad_routes_through_xla():
    x = _rand((1, 4, 6, 64), 6, jnp.float32)
    w = _rand((3, 3, 64, 64), 7, jnp.float32) * 0.05
    b = jnp.zeros((64,), jnp.float32)

    def loss_pallas(w):
        return jnp.sum(
            conv_pallas.conv3x3_im2col_pallas(x, w, b, True, 2, True) ** 2
        )

    def loss_xla(w):
        return jnp.sum(conv_pallas._xla_conv3x3(x, w, b, True) ** 2)

    g_p = jax.grad(loss_pallas)(w)
    g_x = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-4
    )


def test_conv3x3_grad_routes_through_xla():
    """The custom VJP must be differentiable (backward = XLA conv graph)."""
    x = _rand((1, 4, 6, 128), 6, jnp.float32)
    w = _rand((3, 3, 128, 128), 7, jnp.float32) * 0.05
    b = jnp.zeros((128,), jnp.float32)

    def loss_pallas(w):
        return jnp.sum(
            conv_pallas.conv3x3_pallas(x, w, b, True, 2, 128, True) ** 2
        )

    def loss_xla(w):
        return jnp.sum(conv_pallas._xla_conv3x3(x, w, b, True) ** 2)

    g_p = jax.grad(loss_pallas)(w)
    g_x = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-4
    )
