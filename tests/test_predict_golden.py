"""End-to-end predict-pipeline golden test.

NumPy re-implementation of the reference predict path
(/root/reference/pytorch/FasterRCNN/models/faster_rcnn.py:135-226):
per-class delta decode with stds [.1,.1,.2,.2], clip to [0, dim-1], score
threshold, per-class greedy NMS at IoU 0.3 — fed with the SAME proposals and
head outputs the jitted model produces, and compared box-for-box against
make_predict_fn's assembled Detections. This proves the assembled pipeline
(not just its golden-tested pieces) matches reference semantics.
"""

import numpy as np
import jax.numpy as jnp

from fasterrcnn_tpu.models.faster_rcnn import FasterRCNN, init_params, make_predict_fn
from fasterrcnn_tpu.ops import nms as nms_ops
from tests.test_model import CANVAS_H, CANVAS_W, synthetic_batch, tiny_config

DELTA_STDS = np.asarray([0.1, 0.1, 0.2, 0.2], np.float32)


def reference_predict_numpy(proposals, valid, class_logits, box_deltas,
                            image_hw, score_threshold, nms_iou, num_classes):
    """Port of reference faster_rcnn.py:175-226 for one image (NumPy)."""
    probs = np.exp(class_logits - class_logits.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    h, w = image_hw
    anchors = np.stack(
        [
            0.5 * (proposals[:, 0] + proposals[:, 2]),
            0.5 * (proposals[:, 1] + proposals[:, 3]),
            proposals[:, 2] - proposals[:, 0],
            proposals[:, 3] - proposals[:, 1],
        ],
        axis=1,
    )
    out = {}
    for cls in range(1, num_classes):
        deltas = box_deltas[:, (cls - 1) * 4 : cls * 4] * DELTA_STDS
        cy = anchors[:, 2] * deltas[:, 0] + anchors[:, 0]
        cx = anchors[:, 3] * deltas[:, 1] + anchors[:, 1]
        bh = anchors[:, 2] * np.exp(deltas[:, 2])
        bw = anchors[:, 3] * np.exp(deltas[:, 3])
        boxes = np.stack(
            [cy - 0.5 * bh, cx - 0.5 * bw, cy + 0.5 * bh, cx + 0.5 * bw], axis=1
        )
        # Predict-time clip is to [0, dim-1] (faster_rcnn.py:200-201).
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, h - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, w - 1)
        scores = probs[:, cls]
        keep = (scores > score_threshold) & (valid > 0)
        boxes_k, scores_k = boxes[keep], scores[keep]
        if len(scores_k) == 0:
            out[cls] = (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
            continue
        sel = nms_ops.nms_reference_numpy(boxes_k, scores_k, iou_threshold=nms_iou)
        order = np.argsort(-scores_k[sel], kind="stable")
        out[cls] = (boxes_k[sel][order], scores_k[sel][order])
    return out


def test_predict_pipeline_matches_reference_port():
    # The SHIPPED default config is uncapped (max_detections_per_class=0 ->
    # one output row per proposal), so this parity test covers exactly the
    # configuration users run: no truncation can hide a mismatch.
    cfg = tiny_config()
    assert cfg.detector.max_detections_per_class == 0
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, CANVAS_H, CANVAS_W, seed=0)
    batch = synthetic_batch(np.random.default_rng(5), b=2)

    # Intermediates from the shared forward pass (same code predict runs).
    prop_boxes, prop_valid, class_logits, box_deltas = model.apply(
        {"params": params}, batch.images, batch.image_hw
    )
    det = make_predict_fn(model, CANVAS_H, CANVAS_W)(
        params, batch.images, batch.image_hw, score_threshold=0.05
    )

    for i in range(batch.images.shape[0]):
        want = reference_predict_numpy(
            np.asarray(prop_boxes[i]),
            np.asarray(prop_valid[i]),
            np.asarray(class_logits[i], np.float32),
            np.asarray(box_deltas[i], np.float32),
            np.asarray(batch.image_hw[i]),
            score_threshold=0.05,
            nms_iou=cfg.detector.test_nms_iou_threshold,
            num_classes=cfg.num_classes,
        )
        for cls in range(1, cfg.num_classes):
            v = np.asarray(det.valid[i, cls - 1]) > 0
            got_boxes = np.asarray(det.boxes[i, cls - 1])[v]
            got_scores = np.asarray(det.scores[i, cls - 1])[v]
            want_boxes, want_scores = want[cls]
            assert len(got_scores) == len(want_scores), (
                f"class {cls}: {len(got_scores)} vs {len(want_scores)} detections"
            )
            if len(want_scores):
                np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4)
                np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-3, atol=1e-2)


def test_predict_pipeline_has_detections():
    """Guard: the fixture actually exercises the pipeline (nonzero dets)."""
    cfg = tiny_config()
    model = FasterRCNN(cfg=cfg)
    params = init_params(model, CANVAS_H, CANVAS_W, seed=0)
    batch = synthetic_batch(np.random.default_rng(5), b=2)
    det = make_predict_fn(model, CANVAS_H, CANVAS_W)(
        params, batch.images, batch.image_hw, score_threshold=0.05
    )
    assert float(np.asarray(det.valid).sum()) > 0
