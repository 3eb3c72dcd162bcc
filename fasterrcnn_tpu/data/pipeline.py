"""Padded, bucketed batching + background prefetch (host -> device pipeline).

The reference feeds one dynamically-shaped sample at a time straight into the
model (pytorch __main__.py:174-184). Here, samples are padded into a small
set of static canvas buckets (config.CANVAS_BUCKETS) so XLA compiles once per
bucket, batches form within a bucket, and a background thread keeps the
device fed (the reference's data generator was its hot loop #1,
SURVEY.md section 3.1).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np

from fasterrcnn_tpu.config import CANVAS_BUCKETS, select_canvas
from fasterrcnn_tpu.data.voc import Sample


class HostBatch:
    """Numpy staging of models.faster_rcnn.Batch plus per-sample metadata."""

    def __init__(
        self,
        canvas_hw,
        images,
        image_hw,
        gt_boxes,
        gt_classes,
        gt_mask,
        sample_weight,
        samples,
    ):
        self.canvas_hw: Tuple[int, int] = canvas_hw
        self.images: np.ndarray = images  # (B, Hc, Wc, 3) u8
        self.image_hw: np.ndarray = image_hw  # (B, 2) f32
        self.gt_boxes: np.ndarray = gt_boxes  # (B, G, 4) f32
        self.gt_classes: np.ndarray = gt_classes  # (B, G) i32
        self.gt_mask: np.ndarray = gt_mask  # (B, G) f32
        self.sample_weight: np.ndarray = sample_weight  # (B,) f32
        self.samples: List[Sample] = samples  # real samples only (<= B)


def pad_sample_into(batch_images, i, sample: Sample):
    h, w = sample.image_hw
    batch_images[i, :h, :w, :] = sample.image_u8


def _decode_deferred_into(images: np.ndarray, samples: List[Sample], idx):
    """Decode deferred samples straight into the padded batch canvas.

    One threaded native-loader call per batch (GIL released for its whole
    duration); the per-sample scratch canvas + copy of the eager path never
    happens. Samples with a cache_sink are decoded unflipped (the dataset
    caches one variant per file) and flipped in place afterwards.
    """
    from fasterrcnn_tpu.data import image as image_lib
    from fasterrcnn_tpu.data import native_loader

    spec = samples[idx[0]].deferred
    if native_loader.available():
        jpegs = []
        flips = []
        for i in idx:
            with open(samples[i].filepath, "rb") as f:
                jpegs.append(f.read())
            flips.append(
                samples[i].flip and samples[i].deferred.cache_sink is None
            )
        real_hw, _ = native_loader.decode_batch_into(
            jpegs,
            images,
            dest_indices=idx,
            min_side=spec.min_side,
            max_side=spec.max_side,
            flips=flips,
        )
        decoded_hw = [(int(real_hw[k, 0]), int(real_hw[k, 1])) for k in range(len(idx))]
    else:
        decoded_hw = []
        for i in idx:
            s = samples[i]
            arr, _, _, _ = image_lib.load_image(
                s.filepath,
                min_dimension_pixels=spec.min_side,
                max_dimension_pixels=spec.max_side,
                horizontal_flip=s.flip and s.deferred.cache_sink is None,
            )
            images[i, : arr.shape[0], : arr.shape[1]] = arr
            decoded_hw.append((arr.shape[0], arr.shape[1]))

    for k, i in enumerate(idx):
        s = samples[i]
        rh, rw = decoded_hw[k]
        if (rh, rw) != tuple(s.image_hw):
            raise ValueError(
                f"{s.filepath}: decoded to {(rh, rw)} but the annotation's "
                f"<size> element predicted {tuple(s.image_hw)}"
            )
        sink = s.deferred.cache_sink
        if sink is not None:
            unflipped = images[i, :rh, :rw].copy()
            sink(unflipped)
            if s.flip:
                images[i, :rh, :rw] = unflipped[:, ::-1]
        s.image_u8 = images[i, :rh, :rw]
        s.deferred = None


def make_host_batch(
    samples: List[Sample],
    canvas_hw: Tuple[int, int],
    max_gt: int,
    pad_to: Optional[int] = None,
) -> HostBatch:
    """Stage samples into one padded canvas batch.

    pad_to: if set and > len(samples), the batch is padded with blank images
    (zero pixels, full-canvas extent, no GT) of sample_weight 0, so residue
    batches reuse the full-size compiled program instead of tracing a new
    shape — on the real chip one extra compile costs minutes.
    """
    b = max(len(samples), pad_to or 0)
    ch, cw = canvas_hw
    images = np.zeros((b, ch, cw, 3), np.uint8)
    # Padding rows use the canvas extent: a zero-size extent would divide by
    # zero in RoI normalization and poison gradients with NaN * 0.
    image_hw = np.tile(
        np.asarray([[float(ch), float(cw)]], np.float32), (b, 1)
    )
    gt_boxes = np.zeros((b, max_gt, 4), np.float32)
    gt_classes = np.zeros((b, max_gt), np.int32)
    gt_mask = np.zeros((b, max_gt), np.float32)
    sample_weight = np.zeros((b,), np.float32)
    deferred_idx = [i for i, s in enumerate(samples) if s.image_u8 is None]
    for i, s in enumerate(samples):
        if s.image_u8 is not None:
            pad_sample_into(images, i, s)
        image_hw[i] = s.image_hw
        sample_weight[i] = 1.0
        n = min(len(s.gt_boxes), max_gt)
        if len(s.gt_boxes) > max_gt:
            raise ValueError(
                f"{s.filepath}: {len(s.gt_boxes)} gt boxes exceeds max_gt={max_gt}"
            )
        for j in range(n):
            gt_boxes[i, j] = s.gt_boxes[j].corners
            gt_classes[i, j] = s.gt_boxes[j].class_index
            gt_mask[i, j] = 1.0
    if deferred_idx:
        _decode_deferred_into(images, samples, deferred_idx)
    return HostBatch(
        canvas_hw,
        images,
        image_hw,
        gt_boxes,
        gt_classes,
        gt_mask,
        sample_weight,
        samples,
    )


def batched(
    dataset: Iterable[Sample],
    batch_size: int,
    max_gt: int,
    drop_remainder: bool = False,
    pad_residues: bool = True,
) -> Iterator[HostBatch]:
    """Group samples by canvas bucket and emit padded batches.

    Per-bucket accumulation keeps every batch a single static shape. At
    iterator end, each bucket's residue is padded up to batch_size with
    zero-weight blanks (default — exactly one compiled shape per bucket),
    emitted at its natural smaller size (pad_residues=False), or dropped
    (drop_remainder=True).
    """
    pending = {hw: [] for hw in CANVAS_BUCKETS}
    for sample in dataset:
        hw = select_canvas(*sample.image_hw)
        pending[hw].append(sample)
        if len(pending[hw]) == batch_size:
            yield make_host_batch(pending[hw], hw, max_gt)
            pending[hw] = []
    if not drop_remainder:
        for hw, group in pending.items():
            if group:
                yield make_host_batch(
                    group, hw, max_gt, pad_to=batch_size if pad_residues else None
                )


class Prefetcher:
    """Run an iterator in a background thread with a bounded queue.

    Cancellable: `close()` stops the worker promptly (it checks the stop flag
    around every blocking put), so an early-exiting consumer — e.g. periodic
    eval of the first N samples — doesn't keep decoding the rest of the split
    in the background on this 1-core host.
    """

    _DONE = object()

    def __init__(self, iterator: Iterator, depth: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._closed = False

        def worker():
            try:
                for item in iterator:
                    while not self._stop.is_set():
                        try:
                            self._queue.put(item, timeout=0.05)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._error = e
            finally:
                while True:
                    try:
                        self._queue.put_nowait(self._DONE)
                        break
                    except queue.Full:
                        try:
                            self._queue.get_nowait()
                        except queue.Empty:
                            pass

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 5.0):
        """Stop the worker and drop queued items (iteration ends after)."""
        self._closed = True
        self._stop.set()
        while True:  # unblock a put stuck on a full queue
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            import warnings

            warnings.warn(
                "Prefetcher worker did not stop within "
                f"{timeout}s of close(); it is blocked inside the wrapped "
                "iterator (slow decode/IO?) and will keep consuming the "
                "source until its next yield",
                RuntimeWarning,
                stacklevel=2,
            )

    def __iter__(self):
        return self

    def __next__(self):
        if self._closed:
            # The drain in close() may have swallowed the _DONE sentinel;
            # never block on a queue whose worker is gone.
            raise StopIteration
        item = self._queue.get()
        if item is self._DONE:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
