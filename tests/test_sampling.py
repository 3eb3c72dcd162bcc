"""Sampling tests: fixed-shape RPN minibatch + proposal labeling/sampling
must reproduce the reference's count/constraint semantics distributionally."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.ops import sampling as samp


def test_rpn_minibatch_counts_balanced():
    a = 5000
    rng = np.random.default_rng(0)
    trainable = (rng.uniform(size=a) < 0.3).astype(np.float32)
    objectness = ((rng.uniform(size=a) < 0.1) & (trainable > 0)).astype(np.float32)
    sel = np.asarray(
        samp.sample_rpn_minibatch(
            jax.random.key(0), jnp.asarray(trainable), jnp.asarray(objectness), 256
        )
    )
    n_pos_avail = int(((trainable > 0) & (objectness > 0)).sum())
    n_pos_sel = int((sel * objectness).sum())
    n_neg_sel = int((sel * (1 - objectness)).sum())
    assert n_pos_sel == min(128, n_pos_avail)
    assert n_pos_sel + n_neg_sel == 256
    assert set(np.unique(trainable[sel > 0])) == {1.0}  # only trainable selected


def test_rpn_minibatch_few_positives():
    a = 1000
    trainable = np.ones(a, np.float32)
    objectness = np.zeros(a, np.float32)
    objectness[:5] = 1.0
    sel = np.asarray(
        samp.sample_rpn_minibatch(
            jax.random.key(1), jnp.asarray(trainable), jnp.asarray(objectness), 256
        )
    )
    assert int((sel * objectness).sum()) == 5
    assert int(sel.sum()) == 256  # backfilled with negatives


def test_rpn_minibatch_is_random():
    a = 4000
    trainable = np.ones(a, np.float32)
    objectness = np.zeros(a, np.float32)
    objectness[:2000] = 1.0
    sels = [
        np.asarray(
            samp.sample_rpn_minibatch(
                jax.random.key(s), jnp.asarray(trainable), jnp.asarray(objectness), 256
            )
        )
        for s in range(2)
    ]
    assert not np.array_equal(sels[0], sels[1])


def make_proposal_setup(rng, p=200, g=8, g_real=3):
    proposals = np.zeros((p, 4), np.float32)
    y1 = rng.uniform(0, 400, p)
    x1 = rng.uniform(0, 500, p)
    proposals[:, 0] = y1
    proposals[:, 1] = x1
    proposals[:, 2] = y1 + rng.uniform(16, 200, p)
    proposals[:, 3] = x1 + rng.uniform(16, 200, p)
    valid = (rng.uniform(size=p) > 0.2).astype(np.float32)
    gt = np.zeros((g, 4), np.float32)
    gt_cls = np.zeros((g,), np.int32)
    gt_mask = np.zeros((g,), np.float32)
    for i in range(g_real):
        gy, gx = rng.uniform(0, 300), rng.uniform(0, 400)
        gt[i] = [gy, gx, gy + rng.uniform(50, 200), gx + rng.uniform(50, 200)]
        gt_cls[i] = rng.integers(1, 21)
        gt_mask[i] = 1.0
    return proposals, valid, gt, gt_cls, gt_mask


def test_label_and_sample_constraints():
    rng = np.random.default_rng(3)
    proposals, valid, gt, gt_cls, gt_mask = make_proposal_setup(rng)
    out = samp.label_and_sample_proposals(
        jax.random.key(0),
        jnp.asarray(proposals),
        jnp.asarray(valid),
        jnp.asarray(gt),
        jnp.asarray(gt_cls),
        jnp.asarray(gt_mask),
        batch_size=128,
    )
    w = np.asarray(out.weights)
    cls = np.asarray(out.classes)
    n_pos = int(((cls > 0) & (w > 0)).sum())
    n_live = int(w.sum())
    assert n_live == int(out.count)
    assert n_live <= 128
    assert n_pos <= round(128 * 0.25)
    assert n_pos >= 1  # gt injection guarantees positives
    # Live slots are packed first.
    assert (w[: n_live] == 1).all() and (w[n_live:] == 0).all()


def test_gt_injection_makes_exact_positives():
    """A gt box injected as a proposal must be labeled its own class with
    zero-ish regression targets."""
    rng = np.random.default_rng(4)
    # No overlapping proposals at all: only injected gt boxes are positive.
    proposals = np.tile(np.array([[500.0, 500.0, 550.0, 550.0]], np.float32), (50, 1))
    valid = np.ones(50, np.float32)
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [10, 10, 120, 130]
    gt_cls = np.array([7, 0, 0, 0], np.int32)
    gt_mask = np.array([1.0, 0, 0, 0], np.float32)
    out = samp.label_and_sample_proposals(
        jax.random.key(0),
        jnp.asarray(proposals),
        jnp.asarray(valid),
        jnp.asarray(gt),
        jnp.asarray(gt_cls),
        jnp.asarray(gt_mask),
        batch_size=128,
    )
    w = np.asarray(out.weights)
    cls = np.asarray(out.classes)
    pos_slots = np.where((cls > 0) & (w > 0))[0]
    assert len(pos_slots) == 1
    assert cls[pos_slots[0]] == 7
    np.testing.assert_allclose(
        np.asarray(out.boxes)[pos_slots[0]], gt[0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.deltas)[pos_slots[0]], np.zeros(4), atol=1e-4
    )


def test_empty_when_no_negatives():
    """If every proposal is positive (reference: num_negative_samples == 0),
    the batch must be empty (faster_rcnn.py:552-553)."""
    gt = np.array([[10, 10, 100, 100]], np.float32)
    proposals = np.tile(gt, (20, 1)) + np.random.default_rng(0).normal(
        0, 2, (20, 4)
    ).astype(np.float32)
    out = samp.label_and_sample_proposals(
        jax.random.key(0),
        jnp.asarray(proposals),
        jnp.ones(20),
        jnp.asarray(gt),
        jnp.asarray([5], dtype=jnp.int32),
        jnp.ones(1),
        batch_size=128,
    )
    assert int(out.count) == 0
    assert float(np.asarray(out.weights).sum()) == 0.0


def test_sampling_respects_validity():
    rng = np.random.default_rng(5)
    proposals, valid, gt, gt_cls, gt_mask = make_proposal_setup(rng)
    valid[:] = 0.0  # all rpn proposals invalid; only injected gt live
    out = samp.label_and_sample_proposals(
        jax.random.key(2),
        jnp.asarray(proposals),
        jnp.asarray(valid),
        jnp.asarray(gt),
        jnp.asarray(gt_cls),
        jnp.asarray(gt_mask),
        batch_size=128,
    )
    # Without valid negatives, the batch must be empty.
    assert int(out.count) == 0
