"""Data pipeline tests: bucketing, padding, prefetch, synthetic dataset."""

import numpy as np
import pytest

from fasterrcnn_tpu.config import CANVAS_BUCKETS, select_canvas
from fasterrcnn_tpu.data.pipeline import Prefetcher, batched, make_host_batch
from fasterrcnn_tpu.data.synthetic import SyntheticDataset, synthetic_samples


def test_select_canvas():
    assert select_canvas(600, 800) == (608, 800)
    assert select_canvas(800, 600) == (800, 608)
    assert select_canvas(600, 901) == (608, 928)
    assert select_canvas(300, 300) == (608, 608)
    with pytest.raises(ValueError):
        select_canvas(2000, 2000)


def test_buckets_are_stride_32_aligned():
    for h, w in CANVAS_BUCKETS:
        assert h % 32 == 0 and w % 32 == 0


def test_batched_groups_by_bucket():
    samples = list(synthetic_samples(6, 600, 800, seed=0)) + list(
        synthetic_samples(3, 800, 600, seed=1)
    )
    batches = list(batched(iter(samples), batch_size=4, max_gt=8))
    shapes = sorted((b.canvas_hw, len(b.samples)) for b in batches)
    assert shapes == [((608, 800), 2), ((608, 800), 4), ((800, 608), 3)]
    for b in batches:
        assert b.images.shape[1:3] == b.canvas_hw
        # padding beyond each real image extent is zero
        h0, w0 = int(b.image_hw[0][0]), int(b.image_hw[0][1])
        assert b.images[0, h0:, :, :].sum() == 0
        assert b.images[0, :, w0:, :].sum() == 0


def test_host_batch_padding_and_masks():
    samples = list(synthetic_samples(2, 600, 800, max_boxes=3, seed=2))
    hb = make_host_batch(samples, (608, 800), max_gt=8)
    assert hb.images.dtype == np.uint8
    for i, s in enumerate(samples):
        n = len(s.gt_boxes)
        assert hb.gt_mask[i].sum() == n
        np.testing.assert_allclose(hb.gt_boxes[i, 0], s.gt_boxes[0].corners)
        assert (hb.gt_classes[i, n:] == 0).all()
        np.testing.assert_allclose(hb.image_hw[i], [600, 800])


def test_residue_batches_padded_to_full_size():
    """10 samples at bs=4 -> two full batches + one residue padded to 4 with
    zero-weight blanks (exactly one compiled shape per bucket)."""
    samples = list(synthetic_samples(10, 600, 800, seed=4))
    batches = list(batched(iter(samples), batch_size=4, max_gt=8))
    assert [b.images.shape[0] for b in batches] == [4, 4, 4]
    residue = batches[-1]
    assert len(residue.samples) == 2
    np.testing.assert_allclose(residue.sample_weight, [1, 1, 0, 0])
    # Padding rows: blank image, canvas extent (not zero), no GT.
    assert residue.images[2:].sum() == 0
    np.testing.assert_allclose(residue.image_hw[2], [608.0, 800.0])
    assert residue.gt_mask[2:].sum() == 0

    natural = list(
        batched(iter(samples), batch_size=4, max_gt=8, pad_residues=False)
    )
    assert [b.images.shape[0] for b in natural] == [4, 4, 2]

    dropped = list(
        batched(iter(samples), batch_size=4, max_gt=8, drop_remainder=True)
    )
    assert [b.images.shape[0] for b in dropped] == [4, 4]


def test_prefetcher_close_stops_worker():
    produced = []

    def slow_gen():
        for i in range(1000):
            produced.append(i)
            yield i

    pf = Prefetcher(slow_gen(), depth=2)
    assert next(pf) == 0
    pf.close()
    count_at_close = len(produced)
    # Worker must have stopped near where it was (queue depth + 1 slack),
    # not drained the whole generator.
    assert count_at_close <= 8
    import time

    time.sleep(0.2)
    assert len(produced) <= count_at_close + 1


def test_gt_overflow_raises():
    samples = list(synthetic_samples(1, 600, 800, max_boxes=4, seed=3))
    with pytest.raises(ValueError):
        make_host_batch(samples, (608, 800), max_gt=1)


def test_prefetcher_passthrough_and_error():
    items = list(range(10))
    assert list(Prefetcher(iter(items))) == items

    def boom():
        yield 1
        raise RuntimeError("boom")

    pf = Prefetcher(boom())
    assert next(pf) == 1
    with pytest.raises(RuntimeError):
        list(pf)


def test_synthetic_dataset_contract():
    ds = SyntheticDataset(num_samples=4)
    samples = list(ds)
    assert len(samples) == 4
    for s in samples:
        assert s.image_u8.shape == (600, 800, 3)
        assert len(s.gt_boxes) >= 1
        for b in s.gt_boxes:
            y1, x1, y2, x2 = b.corners
            assert 0 <= y1 < y2 <= 600 and 0 <= x1 < x2 <= 800
