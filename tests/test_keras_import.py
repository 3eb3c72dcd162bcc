"""Bart-Keras h5 VGG-16 import: layout is already HWIO/HWC-flatten, so the
import is direct; verify numerically against the stored arrays."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def make_keras_vgg16_h5(path, rng):
    """Minimal Bart-Keras layout: model_weights/<layer>/<conv_or_dense>/
    {kernel:0,bias:0} (reference state.py:31-37)."""
    shapes = {
        "block1_conv1": (3, 3, 3, 64), "block1_conv2": (3, 3, 64, 64),
        "block2_conv1": (3, 3, 64, 128), "block2_conv2": (3, 3, 128, 128),
        "block3_conv1": (3, 3, 128, 256), "block3_conv2": (3, 3, 256, 256),
        "block3_conv3": (3, 3, 256, 256),
        "block4_conv1": (3, 3, 256, 512), "block4_conv2": (3, 3, 512, 512),
        "block4_conv3": (3, 3, 512, 512),
        "block5_conv1": (3, 3, 512, 512), "block5_conv2": (3, 3, 512, 512),
        "block5_conv3": (3, 3, 512, 512),
        "fc1": (25088, 4096), "fc2": (4096, 4096),
    }
    stored = {}
    with h5py.File(path, "w") as f:
        for layer, shape in shapes.items():
            sub = "dense_1" if layer.startswith("fc") else "conv2d_1"
            g = f.create_group(f"model_weights/{layer}/{sub}")
            k = rng.normal(0, 0.02, shape).astype(np.float32)
            b = rng.normal(0, 0.02, shape[-1]).astype(np.float32)
            g.create_dataset("kernel:0", data=k)
            g.create_dataset("bias:0", data=b)
            stored[layer] = (k, b)
    return stored


def test_keras_h5_import(tmp_path):
    from fasterrcnn_tpu.config import ModelConfig
    from fasterrcnn_tpu.models.faster_rcnn import FasterRCNN, init_params
    from fasterrcnn_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    path = str(tmp_path / "vgg16.h5")
    stored = make_keras_vgg16_h5(path, rng)

    model = FasterRCNN(cfg=ModelConfig(backbone="vgg16"))
    params = init_params(model, 128, 160, seed=0)
    params = ckpt.load(params, path)

    np.testing.assert_array_equal(
        np.asarray(params["feature_extractor"]["block3_conv2"]["kernel"]),
        stored["block3_conv2"][0],
    )
    np.testing.assert_array_equal(
        np.asarray(params["roi_head"]["fc1"]["kernel"]), stored["fc1"][0]
    )
    np.testing.assert_array_equal(
        np.asarray(params["roi_head"]["fc2"]["bias"]), stored["fc2"][1]
    )
