"""Loss-formula parity tests against straightforward NumPy re-derivations of
the reference's loss definitions (rpn.py:176-272, detector.py:83-155)."""

import numpy as np
import jax.numpy as jnp

from fasterrcnn_tpu.models import losses as L


def test_smooth_l1_branches():
    x = jnp.asarray([-2.0, -0.05, 0.0, 0.05, 2.0])
    sigma = 3.0
    got = np.asarray(L.smooth_l1(x, sigma))
    ss = sigma * sigma
    want = np.where(np.abs(x) < 1 / ss, 0.5 * np.asarray(x) ** 2 * ss, np.abs(x) - 0.5 / ss)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rpn_class_loss_matches_bce():
    rng = np.random.default_rng(0)
    a = 500
    logits = rng.normal(0, 2, a).astype(np.float32)
    labels = (rng.uniform(size=a) < 0.3).astype(np.float32)
    mask = (rng.uniform(size=a) < 0.5).astype(np.float32)
    got = float(L.rpn_class_loss(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask)))
    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    bce = -(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    want = (bce * mask).sum() / (mask.sum() + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rpn_regression_loss_positives_only():
    rng = np.random.default_rng(1)
    a = 300
    pred = rng.normal(size=(a, 4)).astype(np.float32)
    tgt = rng.normal(size=(a, 4)).astype(np.float32)
    obj = (rng.uniform(size=a) < 0.2).astype(np.float32)
    mask = (rng.uniform(size=a) < 0.6).astype(np.float32)
    got = float(
        L.rpn_regression_loss(jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(obj), jnp.asarray(mask), 3.0)
    )
    ss = 9.0
    x = tgt - pred
    sl1 = np.where(np.abs(x) < 1 / ss, 0.5 * x * x * ss, np.abs(x) - 0.5 / ss)
    want = (sl1 * (obj * mask)[:, None]).sum() / (mask.sum() + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detector_class_loss_matches_ce():
    rng = np.random.default_rng(2)
    s, c = 64, 21
    logits = rng.normal(size=(s, c)).astype(np.float32)
    classes = rng.integers(0, c, s).astype(np.int32)
    weights = (rng.uniform(size=s) < 0.7).astype(np.float32)
    count = weights.sum()
    got = float(
        L.detector_class_loss(jnp.asarray(logits), jnp.asarray(classes), jnp.asarray(weights), jnp.asarray(count))
    )
    z = logits.astype(np.float64)
    logp = z - np.log(np.exp(z - z.max(1, keepdims=True)).sum(1, keepdims=True)) - z.max(1, keepdims=True)
    want = -(logp[np.arange(s), classes] * weights).sum() / (count + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detector_regression_loss_gathers_target_class():
    """Equivalent to the reference's tiled-mask layout: only the 4 deltas of
    the target class contribute (detector.py:137-155)."""
    rng = np.random.default_rng(3)
    s, c = 32, 21
    preds = rng.normal(size=(s, 4 * (c - 1))).astype(np.float32)
    classes = rng.integers(0, c, s).astype(np.int32)
    tgts = rng.normal(size=(s, 4)).astype(np.float32)
    weights = np.ones(s, np.float32)
    count = float(s)
    got = float(
        L.detector_regression_loss(
            jnp.asarray(preds), jnp.asarray(classes), jnp.asarray(tgts), jnp.asarray(weights), jnp.asarray(count), 1.0
        )
    )
    # Reference layout: mask (S, 4*(C-1)) one-hot-per-class-tiled.
    total = 0.0
    for i in range(s):
        if classes[i] == 0:
            continue
        sl = (classes[i] - 1) * 4
        x = tgts[i] - preds[i, sl : sl + 4]
        sl1 = np.where(np.abs(x) < 1.0, 0.5 * x * x, np.abs(x) - 0.5)
        total += sl1.sum()
    want = total / (count + 1e-7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_losses_zero_when_empty():
    s, c = 16, 21
    z = jnp.zeros
    assert float(L.detector_class_loss(z((s, c)), z((s,), jnp.int32), z((s,)), jnp.asarray(0.0))) == 0.0
    assert (
        float(
            L.detector_regression_loss(
                z((s, 4 * (c - 1))), z((s,), jnp.int32), z((s, 4)), z((s,)), jnp.asarray(0.0), 1.0
            )
        )
        == 0.0
    )
