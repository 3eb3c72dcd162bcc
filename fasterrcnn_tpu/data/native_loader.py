"""ctypes binding for the native C++ loader (native/loader.cc).

Builds the shared library on demand (g++ + libjpeg, both baked into the
image) and exposes:
  * decode_resize_into: one JPEG -> resized uint8 written into a canvas
  * decode_batch: threaded batch decode straight into a padded batch array

Falls back gracefully: `available()` is False when the toolchain or libjpeg
is missing, and callers (data/voc.py) use the PIL path instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfrcnn_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.frcnn_decode_resize_into.restype = ctypes.c_int
        lib.frcnn_decode_resize_into.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.frcnn_decode_batch.restype = None
        lib.frcnn_decode_batch.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,  # dest_idx (int32* or NULL)
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_into(
    jpeg_bytes: bytes,
    canvas: np.ndarray,
    min_side: int = 600,
    flip: bool = False,
    max_side: int = 0,
) -> Tuple[int, int, int, int]:
    """Decode+resize one JPEG into canvas (H, W, 3) uint8 (top-left).

    Returns (real_h, real_w, orig_h, orig_w)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    assert canvas.dtype == np.uint8 and canvas.ndim == 3 and canvas.shape[2] == 3
    rh = ctypes.c_int()
    rw = ctypes.c_int()
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    rc = lib.frcnn_decode_resize_into(
        jpeg_bytes, len(jpeg_bytes), min_side, max_side, int(flip),
        canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[0], canvas.shape[1],
        ctypes.byref(rh), ctypes.byref(rw), ctypes.byref(oh), ctypes.byref(ow),
    )
    if rc != 0:
        raise ValueError(f"native decode failed with code {rc}")
    return rh.value, rw.value, oh.value, ow.value


def decode_batch_into(
    jpeg_buffers: Sequence[bytes],
    batch: np.ndarray,
    dest_indices: Optional[Sequence[int]] = None,
    min_side: int = 600,
    max_side: int = 0,
    flips: Optional[Sequence[bool]] = None,
    num_threads: int = 0,
):
    """Threaded batch decode DIRECTLY into an existing (B, H, W, 3) uint8
    padded batch array (the production host->device staging buffer).

    dest_indices: batch row for each JPEG (default 0..n-1) — lets a
    partially-cached batch decode only its missing rows. The GIL is released
    for the whole batch, so the prefetch thread's decode overlaps the main
    thread's dispatch work even on a single-core host.

    Returns (real_hw (N,2) int32, orig_hw (N,2) int32)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    assert batch.dtype == np.uint8 and batch.ndim == 4 and batch.shape[3] == 3
    assert batch.flags["C_CONTIGUOUS"]
    n = len(jpeg_buffers)
    blob = b"".join(jpeg_buffers)
    lengths = np.asarray([len(b) for b in jpeg_buffers], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    flips_arr = np.asarray(
        [int(bool(f)) for f in (flips or [False] * n)], np.int32
    )
    if dest_indices is None:
        dest_ptr = None
    else:
        dest_arr = np.ascontiguousarray(dest_indices, np.int32)
        assert dest_arr.shape == (n,)
        assert dest_arr.max(initial=0) < batch.shape[0]
        dest_ptr = dest_arr.ctypes.data_as(ctypes.c_void_p)
    ch, cw = batch.shape[1], batch.shape[2]
    real_hw = np.zeros((n, 2), np.int32)
    orig_hw = np.zeros((n, 2), np.int32)
    results = np.zeros((n,), np.int32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.frcnn_decode_batch(
        blob, offsets, lengths, n, min_side, max_side, flips_arr, batch,
        ch, cw, dest_ptr, real_hw, orig_hw, results, num_threads,
    )
    if results.any():
        bad = int(np.flatnonzero(results)[0])
        raise ValueError(f"native decode failed for image {bad} (code {results[bad]})")
    return real_hw, orig_hw


def decode_batch(
    jpeg_buffers: Sequence[bytes],
    canvas_hw: Tuple[int, int],
    min_side: int = 600,
    flips: Optional[Sequence[bool]] = None,
    num_threads: int = 0,
    max_side: int = 0,
):
    """Threaded batch decode into a fresh (N, H, W, 3) uint8 canvas batch.

    Returns (batch, real_hw (N,2) int32, orig_hw (N,2) int32)."""
    n = len(jpeg_buffers)
    ch, cw = canvas_hw
    batch = np.zeros((n, ch, cw, 3), np.uint8)
    real_hw, orig_hw = decode_batch_into(
        jpeg_buffers, batch, None, min_side, max_side, flips, num_threads
    )
    return batch, real_hw, orig_hw
