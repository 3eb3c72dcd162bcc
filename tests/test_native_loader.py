"""Native C++ loader vs PIL: decode+resize parity and batch API."""

import io

import numpy as np
import pytest
from PIL import Image

from fasterrcnn_tpu.data import native_loader as nl
from fasterrcnn_tpu.data import image as image_lib

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native loader unavailable (no g++/libjpeg)"
)


def make_jpeg(rng, h, w, quality=95):
    src = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(src).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_matches_pil_upscale():
    rng = np.random.default_rng(0)
    jpeg = make_jpeg(rng, 375, 500)
    canvas = np.zeros((608, 800, 3), np.uint8)
    rh, rw, oh, ow = nl.decode_resize_into(jpeg, canvas, 600, False)
    assert (rh, rw, oh, ow) == (600, 800, 375, 500)
    pil = Image.open(io.BytesIO(jpeg)).convert("RGB").resize((800, 600), Image.BILINEAR)
    diff = np.abs(canvas[:600, :800].astype(int) - np.asarray(pil).astype(int))
    assert diff.max() <= 2  # rounding differences only
    # padding untouched
    assert canvas[600:].sum() == 0


def test_decode_flip():
    rng = np.random.default_rng(1)
    jpeg = make_jpeg(rng, 300, 400)
    c1 = np.zeros((608, 800, 3), np.uint8)
    c2 = np.zeros((608, 800, 3), np.uint8)
    nl.decode_resize_into(jpeg, c1, 600, False)
    rh, rw, _, _ = nl.decode_resize_into(jpeg, c2, 600, True)
    np.testing.assert_array_equal(c1[:rh, :rw], c2[:rh, :rw][:, ::-1])


def test_decode_batch():
    rng = np.random.default_rng(2)
    jpegs = [make_jpeg(rng, 375, 500), make_jpeg(rng, 300, 400), make_jpeg(rng, 450, 375)]
    batch, real_hw, orig_hw = nl.decode_batch(jpegs, (800, 800), 600)
    assert batch.shape == (3, 800, 800, 3)
    np.testing.assert_array_equal(orig_hw, [[375, 500], [300, 400], [450, 375]])
    np.testing.assert_array_equal(real_hw, [[600, 800], [600, 800], [720, 600]])


def test_load_image_native_path(tmp_path):
    rng = np.random.default_rng(3)
    jpeg = make_jpeg(rng, 375, 500)
    path = tmp_path / "img.jpg"
    path.write_bytes(jpeg)
    u8_native, pil_n, scale_n, orig_n = image_lib.load_image(str(path), 600)
    u8_pil, _, scale_p, orig_p = image_lib.load_image(str(path), 600, use_native=False)
    assert u8_native.shape == u8_pil.shape == (600, 800, 3)
    assert scale_n == scale_p and orig_n == orig_p
    assert np.abs(u8_native.astype(int) - u8_pil.astype(int)).max() <= 2
    assert pil_n.size == (800, 600)


def test_corrupt_jpeg_raises():
    canvas = np.zeros((608, 800, 3), np.uint8)
    with pytest.raises(ValueError):
        nl.decode_resize_into(b"not a jpeg", canvas, 600, False)
