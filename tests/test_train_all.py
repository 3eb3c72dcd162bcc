"""From-scratch mode (ModelConfig.train_all / --train-all).

The reference's freeze patterns (VGG blocks 1-2, vgg16.py:49-58; ResNet
conv1/bn1/layer1 + all BN affines, resnet.py:48-77) protect ImageNet
pretrained weights; with random initialization they freeze noise. train_all
lifts the optimizer masks and stop_gradient cuts, and fresh ResNets zero-init
each bottleneck's final BN scale so the residual branches open gradually —
the standard from-scratch deep-ResNet initialization. These tests pin:

  * nothing is labeled frozen under train_all (both backbone families);
  * the ResNet init switch (bn3 scale zeros vs ones) and that the parameter
    tree structure is mode-independent (checkpoints stay interchangeable);
  * a real train step updates the otherwise-frozen params under train_all
    and leaves them untouched by default.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.config import TrainConfig
from fasterrcnn_tpu.engine import make_optimizer
from fasterrcnn_tpu.models.faster_rcnn import (
    FasterRCNN,
    init_params,
    make_train_step,
)

from test_model import CANVAS_H, CANVAS_W, synthetic_batch, tiny_config


def _flat(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.mark.parametrize("backbone", ["vgg16", "resnet50"])
def test_train_all_labels_nothing_frozen(backbone):
    cfg = tiny_config(backbone=backbone)
    params = init_params(FasterRCNN(cfg=cfg), CANVAS_H, CANVAS_W, seed=0)

    _, labels = make_optimizer(cfg, TrainConfig(), params)
    frozen = [k for k, v in _flat(labels).items() if v == "frozen"]
    assert frozen, f"{backbone}: default mode should freeze backbone params"

    cfg_all = dataclasses.replace(cfg, train_all=True)
    _, labels_all = make_optimizer(cfg_all, TrainConfig(), params)
    frozen_all = [k for k, v in _flat(labels_all).items() if v == "frozen"]
    assert frozen_all == [], f"train_all left frozen params: {frozen_all[:5]}"


def test_resnet_from_scratch_zero_inits_bn3():
    cfg = tiny_config(backbone="resnet50")
    cfg_all = dataclasses.replace(cfg, train_all=True)
    flat = _flat(init_params(FasterRCNN(cfg=cfg), CANVAS_H, CANVAS_W, seed=0))
    flat_all = _flat(
        init_params(FasterRCNN(cfg=cfg_all), CANVAS_H, CANVAS_W, seed=0)
    )

    # Same tree either way: checkpoints are interchangeable across modes.
    assert set(flat) == set(flat_all)

    bn3 = [k for k in flat if k.endswith("bn3/scale")]
    assert len(bn3) == 16  # resnet50: 3 + 4 + 6 + 3 bottlenecks
    for k in bn3:
        np.testing.assert_array_equal(np.asarray(flat[k]), 1.0)
        np.testing.assert_array_equal(np.asarray(flat_all[k]), 0.0)

    # The shortcut path must stay open in both modes.
    for k in (k for k in flat if k.endswith("downsample_bn/scale")):
        np.testing.assert_array_equal(np.asarray(flat[k]), 1.0)
        np.testing.assert_array_equal(np.asarray(flat_all[k]), 1.0)


@pytest.mark.parametrize("train_all", [False, True])
def test_step_updates_frozen_params_only_under_train_all(train_all):
    cfg = dataclasses.replace(tiny_config("vgg16"), train_all=train_all)
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, CANVAS_H, CANVAS_W, seed=0)
    before = np.asarray(params["feature_extractor"]["block1_conv1"]["kernel"])

    tx, _ = make_optimizer(cfg, TrainConfig(), params)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, CANVAS_H, CANVAS_W)
    batch = synthetic_batch(np.random.default_rng(2))
    params, opt_state, losses = step(params, opt_state, batch, jax.random.key(0))
    assert np.isfinite(float(losses.total))

    after = np.asarray(params["feature_extractor"]["block1_conv1"]["kernel"])
    changed = not np.array_equal(before, after)
    assert changed == train_all, (
        f"train_all={train_all}: frozen-block kernel "
        f"{'did not update' if train_all else 'moved'}"
    )
