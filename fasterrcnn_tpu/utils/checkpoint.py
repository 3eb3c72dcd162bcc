"""Checkpointing and pretrained-weight import.

Capability parity with reference state.py:14-289 plus the tf2 tree's Keras
load path, adapted to a flax param pytree:

  * Native checkpoints: orbax CheckpointManager for per-epoch training state
    (auto-resume), flax msgpack for single-file final/best weights. Following
    the reference's hard-learned rule, resume restores *weights only* — the
    optimizer restarts fresh so a changed LR is honored (reference
    README.md:231-256).
  * Import formats (detection order mirrors state.py:221-264):
      1. Bart-Keras VGG-16 h5 (state.py:116-176) — conv kernels are already
         HWIO and fc1 is already (7,7,512)-flatten-ordered, so import is
         direct (unlike the reference, which must permute *to* torch layout;
         our NHWC tree is the layout the h5 file is in).
      2. Caffe vgg16_caffe.pth (state.py:178-219) — torch pickles; OIHW ->
         HWIO kernel transpose, and fc1 rows reordered from CHW-flatten to
         HWC-flatten.
      3. Full reference PyTorch checkpoints {"epoch", "model_state_dict"}
         (pytorch __main__.py:195-198) — the complete trained model incl.
         RPN and detector heads, so reference users' checkpoints work here.
      4. torchvision resnet50/101/152 IMAGENET1K_V1 state dicts — BN running
         stats folded into FrozenBatchNorm scale/bias.
      5. Our own msgpack files.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import flax
import jax

VGG16_CONV_LAYERS = tuple(
    f"block{b}_conv{c}"
    for b, n in ((1, 2), (2, 2), (3, 3), (4, 3), (5, 3))
    for c in range(1, n + 1)
)

# Caffe/torchvision VGG-16 "features.N" indices for the 13 convs
# (state.py:183-199 — identical module ordering in both sources).
_VGG_FEATURES_INDEX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _torch_fc1_to_hwc(w: np.ndarray, channels: int = 512, side: int = 7) -> np.ndarray:
    """torch fc1 weight (4096, C*H*W in CHW order) -> (H*W*C, 4096) HWC order.

    Inverse of the recipe the reference documents for the other direction
    (state.py:150-157).
    """
    w = w.reshape(4096, channels, side, side)
    w = np.transpose(w, (2, 3, 1, 0))  # (7, 7, 512, 4096)
    return w.reshape(side * side * channels, 4096)


def _to_numpy_state(obj) -> Dict[str, np.ndarray]:
    """torch state dict -> {name: np.ndarray} without keeping torch tensors."""
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def _load_torch_file(filepath: str):
    """torch.load with safe unpickling; arbitrary-code pickles are opt-in.

    weights_only=True covers every real checkpoint format we import (plain
    tensor dicts, incl. the reference's {'epoch', 'model_state_dict'} files).
    A file that *requires* full unpickling executes arbitrary code from the
    checkpoint, so that path is gated behind FASTERRCNN_UNSAFE_PICKLE=1.
    """
    import torch

    try:
        return torch.load(filepath, map_location="cpu", weights_only=True)
    except Exception as e:
        if os.environ.get("FASTERRCNN_UNSAFE_PICKLE") == "1":
            return torch.load(filepath, map_location="cpu", weights_only=False)
        raise ValueError(
            f"'{filepath}' could not be loaded with safe unpickling "
            f"(weights_only=True): {e}. If you trust this file, set "
            "FASTERRCNN_UNSAFE_PICKLE=1 to allow full pickle execution."
        ) from e


def _set(params: Dict, path: str, value: np.ndarray) -> None:
    node = params
    *parents, leaf = path.split("/")
    for p in parents:
        node = node[p]
    expected = node[leaf].shape
    if tuple(value.shape) != tuple(expected):
        raise ValueError(f"{path}: shape {value.shape} != expected {expected}")
    node[leaf] = value.astype(np.float32)


# ---------------------------------------------------------------------------
# Importers (each takes/returns a mutable nested-dict param tree)
# ---------------------------------------------------------------------------


def _import_torch_vgg16_state(state: Dict[str, np.ndarray], params: Dict,
                              source: str) -> Dict:
    """features.N / classifier.N torch VGG-16 state dict -> our tree.

    Covers both pretrained VGG-16 sources the reference uses, which share
    the module ordering: the Caffe conversion vgg16_caffe.pth
    (state.py:178-219) and torchvision.models.vgg16 IMAGENET1K_V1
    (vgg16_torch.py:27,47,67 — features[0:-1] convs + classifier 0/3
    linears; classifier.6, the 1000-way head, is skipped)."""
    loaded = []
    for idx, layer in zip(_VGG_FEATURES_INDEX, VGG16_CONV_LAYERS):
        wk, bk = f"features.{idx}.weight", f"features.{idx}.bias"
        if wk in state and bk in state:
            _set(params, f"feature_extractor/{layer}/kernel", _oihw_to_hwio(state[wk]))
            _set(params, f"feature_extractor/{layer}/bias", state[bk])
            loaded.append(layer)
    if "classifier.0.weight" in state:
        _set(params, "roi_head/fc1/kernel", _torch_fc1_to_hwc(state["classifier.0.weight"]))
        _set(params, "roi_head/fc1/bias", state["classifier.0.bias"])
        loaded.append("fc1")
    if "classifier.3.weight" in state:
        _set(params, "roi_head/fc2/kernel", state["classifier.3.weight"].T)
        _set(params, "roi_head/fc2/bias", state["classifier.3.bias"])
        loaded.append("fc2")
    if not loaded:
        raise ValueError(f"'{source}' is not a torch VGG-16 state dict")
    print(f"Loaded {len(loaded)} VGG-16 layers from torch model '{source}'")
    return params


def import_caffe_vgg16(filepath: str, params: Dict) -> Dict:
    """vgg16_caffe.pth (torch pickle): 13 convs + fc1/fc2 (state.py:178-219)."""
    state = _to_numpy_state(_load_torch_file(filepath))
    return _import_torch_vgg16_state(state, params, filepath)


def import_torchvision_vgg16(filepath: str, params: Dict) -> Dict:
    """torchvision.models.vgg16 IMAGENET1K_V1 state dict, the reference's
    second VGG-16 flavor (vgg16_torch.py:67). Same module indices as the
    Caffe conversion; pair with the `vgg16-torch` backbone (RGB/255
    preprocessing, vgg16_torch.py:64)."""
    state = _to_numpy_state(_load_torch_file(filepath))
    return _import_torch_vgg16_state(state, params, filepath)


def import_keras_vgg16(filepath: str, params: Dict) -> Dict:
    """Bart-Keras VGG-16 h5 (state.py:116-176). Kernels are HWIO already."""
    import h5py

    loaded, missing = [], []
    with h5py.File(filepath, "r") as f:

        def find(layer):
            group = f[f"model_weights/{layer}"]
            for sub in group:
                if sub.startswith(("conv", "dense")):
                    return (
                        np.asarray(group[sub]["kernel:0"], np.float32),
                        np.asarray(group[sub]["bias:0"], np.float32),
                    )
            return None, None

        for layer in VGG16_CONV_LAYERS:
            try:
                w, b = find(layer)
            except KeyError:
                w = b = None
            if w is None:
                missing.append(layer)
                continue
            _set(params, f"feature_extractor/{layer}/kernel", w)
            _set(params, f"feature_extractor/{layer}/bias", b)
            loaded.append(layer)
        for fc in ("fc1", "fc2"):
            try:
                w, b = find(fc)
            except KeyError:
                w = b = None
            if w is None:
                missing.append(fc)
                continue
            _set(params, f"roi_head/{fc}/kernel", w)  # (in, out) already
            _set(params, f"roi_head/{fc}/bias", b)
            loaded.append(fc)
    if not loaded:
        raise ValueError(f"'{filepath}' is not a Keras VGG-16 model")
    if missing:
        print(f"Layers missing from '{filepath}': {', '.join(missing)}")
    print(f"Loaded {len(loaded)} VGG-16 layers from Keras model '{filepath}'")
    return params


def _fold_bn(state: Dict[str, np.ndarray], prefix: str, eps: float = 1e-5):
    gamma = state[prefix + ".weight"]
    beta = state[prefix + ".bias"]
    mean = state[prefix + ".running_mean"]
    var = state[prefix + ".running_var"]
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def import_torchvision_resnet(filepath: str, params: Dict) -> Dict:
    """torchvision resnet{50,101,152} state dict -> our FrozenBN tree."""
    state = _to_numpy_state(_load_torch_file(filepath))
    return _import_torchvision_resnet_state(state, params, filepath)


def _import_torchvision_resnet_state(
    state: Dict[str, np.ndarray], params: Dict, filepath: str
) -> Dict:
    if "conv1.weight" not in state or "layer1.0.conv1.weight" not in state:
        raise ValueError(f"'{filepath}' is not a torchvision ResNet state dict")

    _set(params, "feature_extractor/conv1/kernel", _oihw_to_hwio(state["conv1.weight"]))
    s, b = _fold_bn(state, "bn1")
    _set(params, "feature_extractor/bn1/scale", s)
    _set(params, "feature_extractor/bn1/bias", b)

    def import_stage(stage: str, dest: str):
        i = 0
        while f"{stage}.{i}.conv1.weight" in state:
            src = f"{stage}.{i}"
            dst = f"{dest}/block{i}"
            for conv in ("conv1", "conv2", "conv3"):
                _set(params, f"{dst}/{conv}/kernel", _oihw_to_hwio(state[f"{src}.{conv}.weight"]))
                bn = "bn" + conv[-1]
                sc, bi = _fold_bn(state, f"{src}.{bn}")
                _set(params, f"{dst}/{bn}/scale", sc)
                _set(params, f"{dst}/{bn}/bias", bi)
            if f"{src}.downsample.0.weight" in state:
                _set(
                    params,
                    f"{dst}/downsample_conv/kernel",
                    _oihw_to_hwio(state[f"{src}.downsample.0.weight"]),
                )
                sc, bi = _fold_bn(state, f"{src}.downsample.1")
                _set(params, f"{dst}/downsample_bn/scale", sc)
                _set(params, f"{dst}/downsample_bn/bias", bi)
            i += 1
        return i

    for stage, dest in (
        ("layer1", "feature_extractor/layer1"),
        ("layer2", "feature_extractor/layer2"),
        ("layer3", "feature_extractor/layer3"),
        ("layer4", "roi_head/layer4"),
    ):
        n = import_stage(stage, dest)
        assert n > 0, f"stage {stage} empty in '{filepath}'"
    print(f"Loaded torchvision ResNet backbone from '{filepath}'")
    return params


def import_reference_checkpoint(filepath: str, params: Dict) -> Dict:
    """Full reference PyTorch checkpoint ({'model_state_dict': ...}) or bare
    reference state dict: backbone + RPN + detector (VGG-16 models)."""
    raw = _load_torch_file(filepath)
    state = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    state = _to_numpy_state(state)
    return _import_reference_state(state, params, filepath)


def _import_reference_state(
    state: Dict[str, np.ndarray], params: Dict, filepath: str
) -> Dict:
    fe = "_stage1_feature_extractor._"
    if fe + "block1_conv1.weight" not in state:
        raise ValueError(f"'{filepath}' is not a reference FasterRCNN checkpoint")
    for layer in VGG16_CONV_LAYERS:
        _set(params, f"feature_extractor/{layer}/kernel", _oihw_to_hwio(state[fe + layer + ".weight"]))
        _set(params, f"feature_extractor/{layer}/bias", state[fe + layer + ".bias"])

    rpn = "_stage2_region_proposal_network._"
    _set(params, "rpn_head/conv/kernel", _oihw_to_hwio(state[rpn + "rpn_conv1.weight"]))
    _set(params, "rpn_head/conv/bias", state[rpn + "rpn_conv1.bias"])
    _set(params, "rpn_head/objectness/kernel", _oihw_to_hwio(state[rpn + "rpn_class.weight"]))
    _set(params, "rpn_head/objectness/bias", state[rpn + "rpn_class.bias"])
    _set(params, "rpn_head/deltas/kernel", _oihw_to_hwio(state[rpn + "rpn_boxes.weight"]))
    _set(params, "rpn_head/deltas/bias", state[rpn + "rpn_boxes.bias"])

    det = "_stage3_detector_network._"
    _set(params, "roi_head/fc1/kernel",
         _torch_fc1_to_hwc(state[det + "pool_to_feature_vector._fc1.weight"]))
    _set(params, "roi_head/fc1/bias", state[det + "pool_to_feature_vector._fc1.bias"])
    _set(params, "roi_head/fc2/kernel", state[det + "pool_to_feature_vector._fc2.weight"].T)
    _set(params, "roi_head/fc2/bias", state[det + "pool_to_feature_vector._fc2.bias"])
    _set(params, "detector_heads/classifier/kernel", state[det + "classifier.weight"].T)
    _set(params, "detector_heads/classifier/bias", state[det + "classifier.bias"])
    _set(params, "detector_heads/regressor/kernel", state[det + "regressor.weight"].T)
    _set(params, "detector_heads/regressor/bias", state[det + "regressor.bias"])
    print(f"Loaded full reference checkpoint from '{filepath}'")
    return params


# ---------------------------------------------------------------------------
# Native save/load + multi-format loader
# ---------------------------------------------------------------------------


def save_weights(filepath: str, params) -> None:
    """Single-file msgpack of the param pytree."""
    os.makedirs(os.path.dirname(os.path.abspath(filepath)), exist_ok=True)
    with open(filepath, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))
    print(f"Saved model weights to '{filepath}'")


def load_weights_msgpack(filepath: str, params):
    with open(filepath, "rb") as f:
        return flax.serialization.from_bytes(params, f.read())


def _as_mutable(params) -> Dict:
    return jax.tree.map(lambda x: np.asarray(x), flax.core.unfreeze(params))


def _sniff_format(filepath: str) -> str:
    """Cheap file-signature detection: 'h5' | 'torch' | 'msgpack'.

    h5 files start with the HDF5 magic; torch.save emits either a zip
    archive ('PK..', torch >= 1.6) or a bare pickle ('\\x80<proto>'). Our
    own msgpack weight files are everything else.
    """
    with open(filepath, "rb") as f:
        magic = f.read(8)
    if len(magic) < 2:
        raise ValueError(
            f"'{filepath}' is not a recognized checkpoint: file is empty or "
            f"truncated ({len(magic)} bytes)"
        )
    if magic.startswith(b"\x89HDF"):
        return "h5"
    if magic.startswith(b"PK") or magic[:1] == b"\x80":
        return "torch"
    return "msgpack"


def load(params, filepath: str):
    """Multi-format load into an existing param tree (reference
    state.py:221-272 covers Keras h5 / Caffe pth / reference checkpoints;
    we add torchvision ResNet + VGG-16 dicts and our own msgpack files).

    The format is detected from the file signature (then, for torch files,
    from the state-dict keys), so a recognized-but-broken file raises its
    own importer's error instead of a try-every-format dump.
    """
    mutable = _as_mutable(params)
    kind = _sniff_format(filepath)
    if kind == "h5":
        loaded = import_keras_vgg16(filepath, mutable)
    elif kind == "torch":
        raw = _load_torch_file(filepath)
        state = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
        state = _to_numpy_state(state)
        if any(k.startswith("_stage1_feature_extractor.") for k in state):
            loaded = _import_reference_state(state, mutable, filepath)
        elif "layer1.0.conv1.weight" in state:
            loaded = _import_torchvision_resnet_state(state, mutable, filepath)
        elif "features.0.weight" in state:
            loaded = _import_torch_vgg16_state(state, mutable, filepath)
        else:
            sample = ", ".join(sorted(state)[:5])
            raise ValueError(
                f"'{filepath}' is a torch state dict of unknown layout "
                f"(first keys: {sample})"
            )
    else:
        with open(filepath, "rb") as f:
            data = f.read()
        try:
            loaded = flax.serialization.from_bytes(mutable, data)
        except Exception as e:
            raise ValueError(
                f"'{filepath}' matched no known signature (HDF5, torch zip, "
                f"pickle) and failed to parse as a flax msgpack weight file: "
                f"{e}"
            ) from e
    return jax.tree.map(lambda x: np.asarray(x), loaded)


class TrainCheckpointManager:
    """Per-epoch orbax checkpoints with auto-resume.

    The recovery story the reference lacked (SURVEY.md section 5 "failure
    detection": manual rerun with --load-from). Stores {params, epoch, mAP}
    per epoch; `restore_latest` resumes interrupted training. Deliberately
    does NOT store optimizer state — resume restores weights only so a new
    learning rate is honored (reference README.md:231-256).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, params, mAP: float) -> None:
        import orbax.checkpoint as ocp

        self._manager.save(
            epoch,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(jax.device_get(params)),
                meta=ocp.args.JsonSave({"epoch": epoch, "mAP": float(mAP)}),
            ),
        )
        self._manager.wait_until_finished()
        print(
            "Saved checkpoint for epoch %d (mAP %.1f%%) to '%s'"
            % (epoch, mAP, self._dir)
        )

    def latest_epoch(self) -> Optional[int]:
        step = self._manager.latest_step()
        return None if step is None else int(step)

    def restore_latest(self, params_template):
        """(params, epoch) from the newest checkpoint, or None."""
        import orbax.checkpoint as ocp

        step = self._manager.latest_step()
        if step is None:
            return None
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(jax.device_get(params_template)),
                meta=ocp.args.JsonRestore(),
            ),
        )
        print(
            "Resumed from checkpoint epoch %d (mAP %.1f%%) in '%s'"
            % (step, restored["meta"].get("mAP", 0.0), self._dir)
        )
        return restored["params"], int(step)

    def close(self):
        self._manager.close()


class BestWeightsTracker:
    """Keep the best-mAP weights in memory; save at end (state.py:274-289)."""

    def __init__(self, filepath: str):
        self._filepath = filepath
        self._best_params = None
        self._best_map = 0.0
        self._best_epoch = None

    def on_epoch_end(self, params, epoch: int, mAP: float) -> None:
        if mAP > self._best_map:
            self._best_map = mAP
            self._best_epoch = epoch
            self._best_params = jax.device_get(params)

    def save_best_weights(self) -> None:
        if self._best_params is not None:
            save_weights(self._filepath, self._best_params)
            print(
                "Saved best model weights (mAP = %1.2f%%, epoch %s) to '%s'"
                % (self._best_map, self._best_epoch, self._filepath)
            )
