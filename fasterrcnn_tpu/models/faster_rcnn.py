"""Faster R-CNN orchestrator: the whole two-stage model as one jit program.

Capability parity with reference pytorch/FasterRCNN/models/faster_rcnn.py:27-561
(and the tf2 twin), re-designed TPU-first:

  * The reference's train_step (faster_rcnn.py:228-362) interleaves host RNG,
    dynamic shapes, and device work. Here the *entire* step — normalization,
    backbone, RPN, proposal generation/NMS, RPN-target assignment, minibatch
    sampling, proposal labeling/sampling, RoI pooling, detector, 4 losses,
    gradients, optimizer update — is one jit-compiled, donated-buffer XLA
    program over a padded batch. The tf2 tree's single-graph design
    (tf2 faster_rcnn.py:76-168) is the structural precedent; the PyTorch
    tree's hyperparameters are the numerical ground truth.
  * Batches: anything B >= 1 (the reference asserts B == 1 throughout,
    faster_rcnn.py:108,286-290). Per-image shapes are static per canvas
    bucket; real image extents are runtime scalars.
  * Inference returns fixed-shape per-class detections (the reference's
    per-class dict of variable-length arrays, faster_rcnn.py:135-226, is
    reassembled on the host by utils/postprocess).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fasterrcnn_tpu.config import ModelConfig
from fasterrcnn_tpu.models.backbone import get_backbone, normalize_images
from fasterrcnn_tpu.models.detector import DetectorHeads
from fasterrcnn_tpu.models.rpn import RPNHead, generate_proposals
from fasterrcnn_tpu.models import losses as loss_fns
from fasterrcnn_tpu.ops import anchors as anchor_ops
from fasterrcnn_tpu.ops import boxes as box_ops
from fasterrcnn_tpu.ops import nms as nms_ops
from fasterrcnn_tpu.ops import pallas as pallas_pkg
from fasterrcnn_tpu.ops import roi as roi_ops
from fasterrcnn_tpu.ops import sampling as sampling_ops


class Batch(NamedTuple):
    """One padded training/eval batch (canvas-static shapes).

    Residue batches are padded to the full batch size with blank images of
    sample_weight 0 so every bucket compiles exactly one program shape and
    dp sharding always divides evenly; the loss is a weighted mean over
    images, so padding never dilutes gradients.
    """

    images: jnp.ndarray  # (B, Hc, Wc, 3) uint8
    image_hw: jnp.ndarray  # (B, 2) f32 real (height, width) per image
    gt_boxes: jnp.ndarray  # (B, G, 4) f32 corners
    gt_classes: jnp.ndarray  # (B, G) int32
    gt_mask: jnp.ndarray  # (B, G) f32
    sample_weight: jnp.ndarray  # (B,) f32: 1 = real image, 0 = padding


class Detections(NamedTuple):
    """Fixed-shape per-class inference output (B, C-1, D, ...)."""

    boxes: jnp.ndarray  # (B, C-1, D, 4)
    scores: jnp.ndarray  # (B, C-1, D)
    valid: jnp.ndarray  # (B, C-1, D)


class Losses(NamedTuple):
    rpn_class: jnp.ndarray
    rpn_regression: jnp.ndarray
    detector_class: jnp.ndarray
    detector_regression: jnp.ndarray

    @property
    def total(self):
        return (
            self.rpn_class
            + self.rpn_regression
            + self.detector_class
            + self.detector_regression
        )


class FasterRCNN(nn.Module):
    """Backbone + RPN head + RoI head + detector heads as one flax module."""

    cfg: ModelConfig

    def setup(self):
        spec = get_backbone(self.cfg.backbone)
        dtype = self.cfg.compute_dtype
        freeze = not self.cfg.train_all
        self.feature_extractor = spec.make_feature_extractor(dtype, freeze)
        self.rpn_head = RPNHead(
            num_anchors=self.cfg.anchors.num_anchors, dtype=dtype
        )
        self.roi_head = spec.make_head(dtype, self.cfg.detector.dropout, freeze)
        self.detector_heads = DetectorHeads(self.cfg.num_classes, dtype)

    def features_and_rpn(self, images_u8: jnp.ndarray):
        """(B,H,W,3) uint8 -> feature map + flat RPN outputs."""
        spec = get_backbone(self.cfg.backbone)
        x = normalize_images(
            images_u8, spec.preprocessing, self.cfg.compute_jnp_dtype
        )
        fm = self.feature_extractor(x)
        logits, deltas = self.rpn_head(fm)
        b = logits.shape[0]
        return fm, logits.reshape(b, -1), deltas.reshape(b, -1, 4)

    def detect_rois(
        self,
        fm: jnp.ndarray,
        roi_boxes: jnp.ndarray,
        image_hw: jnp.ndarray,
        deterministic: bool = True,
        use_pallas_roi: bool = False,
    ):
        """RoI pooling + head over a padded (B, S, 4) box set.

        All images' RoIs are flattened into one (B*S, ...) stack so the head
        runs as a single large matmul chain (MXU-friendly).

        use_pallas_roi: route the crop+pool through the tap-based Pallas
        kernel (2.1x the einsum path on hardware; see ops/pallas/
        roi_pallas.py). Used by BOTH inference and training — the kernel
        carries a custom VJP (Pallas backward kernel) wrt the feature map;
        RoI boxes are stop-gradient constants either way.
        """
        if self.cfg.roi_mode == "exact_pool":
            spec = get_backbone(self.cfg.backbone)
            scale = 1.0 / spec.feature_pixels
            pooled = jax.vmap(
                lambda f, b: roi_ops.roi_pool_exact(f, b, scale, 7)
            )(fm, roi_boxes)
        elif use_pallas_roi and fm.shape[-1] % 128 == 0:
            from fasterrcnn_tpu.ops.pallas import roi_pallas

            spec = get_backbone(self.cfg.backbone)
            fh, fw = anchor_ops.real_feature_map_size(
                image_hw[:, 0].astype(jnp.int32),
                image_hw[:, 1].astype(jnp.int32),
                spec.feature_pixels,
                spec.fm_ceil_mode,
            )
            norm = jnp.stack(
                [
                    (fh.astype(jnp.float32) - 1.0) / image_hw[:, 0],
                    (fw.astype(jnp.float32) - 1.0) / image_hw[:, 1],
                ],
                axis=1,
            )
            pooled = roi_pallas.roi_pool_taps_pallas(fm, roi_boxes, norm)
        else:
            # Chunk the bilinear crop over RoIs to bound the (chunk,14,W,C)
            # intermediate (peak-memory hot spot at large batch).
            p = roi_boxes.shape[1]
            chunk = next((c for c in (64, 50, 32, 25, 16) if p % c == 0 and p > c), 0)
            spec = get_backbone(self.cfg.backbone)

            def pool_one(f, b, hw):
                # The feature map spans the padded canvas; RoIs must land on
                # the real image's sub-grid, not be stretched to the canvas.
                fh, fw = anchor_ops.real_feature_map_size(
                    hw[0].astype(jnp.int32),
                    hw[1].astype(jnp.int32),
                    spec.feature_pixels,
                    spec.fm_ceil_mode,
                )
                return roi_ops.roi_pool_features(
                    f,
                    b,
                    hw[0],
                    hw[1],
                    7,
                    roi_chunk=chunk,
                    fm_height=fh.astype(jnp.float32),
                    fm_width=fw.astype(jnp.float32),
                )

            pooled = jax.vmap(pool_one)(fm, roi_boxes, image_hw)
        bsz, s = pooled.shape[0], pooled.shape[1]
        flat = pooled.reshape(bsz * s, *pooled.shape[2:])
        vec = self.roi_head(flat, deterministic=deterministic)
        class_logits, box_deltas = self.detector_heads(vec)
        return (
            class_logits.reshape(bsz, s, -1),
            box_deltas.reshape(bsz, s, -1),
        )

    def __call__(self, images_u8: jnp.ndarray, image_hw: jnp.ndarray):
        """Plain forward pass (used for init and the compile-check entry)."""
        fm, logits, deltas = self.features_and_rpn(images_u8)
        cfg = self.cfg
        grid = anchor_grid_for(cfg, images_u8.shape[1], images_u8.shape[2])
        centers = jnp.asarray(grid.centers)
        prop = jax.vmap(
            lambda lg, dl, hw: generate_proposals(
                lg,
                jax.lax.stop_gradient(dl),
                centers,
                proposal_masks(cfg, grid, hw)[0],
                hw[0],
                hw[1],
                cfg.rpn.pre_nms_infer,
                cfg.rpn.post_nms_infer,
                cfg.rpn.nms_iou_threshold,
                cfg.rpn.min_proposal_side,
                use_pallas=nms_ops.default_backend_uses_pallas(),
            )
        )(logits, deltas, image_hw)
        class_logits, box_deltas = self.detect_rois(
            fm,
            prop.boxes,
            image_hw,
            use_pallas_roi=pallas_pkg.use_roi_kernel(),
        )
        return prop.boxes, prop.valid, class_logits, box_deltas


# ---------------------------------------------------------------------------
# Static helpers
# ---------------------------------------------------------------------------


def anchor_grid_for(cfg: ModelConfig, canvas_h: int, canvas_w: int):
    spec = get_backbone(cfg.backbone)
    fm_h, fm_w = spec.compute_feature_map_shape(canvas_h, canvas_w)
    return anchor_ops.generate_anchor_grid(fm_h, fm_w, cfg.anchors)


def proposal_masks(cfg: ModelConfig, grid, image_hw):
    """(proposal_mask, train_valid_mask) for one image's real extent.

    * train_valid: anchor exists (inside the real feature grid) and lies
      fully inside the real image — eligible for RPN training
      (anchors.py:123-125).
    * proposal: anchors eligible to emit proposals — exists, plus the
      validity requirement only when edge proposals are excluded
      (rpn.py:167-173; reference default allows them).
    """
    spec = get_backbone(cfg.backbone)
    fh, fw = anchor_ops.real_feature_map_size(
        image_hw[0].astype(jnp.int32),
        image_hw[1].astype(jnp.int32),
        spec.feature_pixels,
        spec.fm_ceil_mode,
    )
    exists = anchor_ops.anchor_exists(grid, fh, fw)
    valid = anchor_ops.anchor_validity(
        jnp.asarray(grid.corners), image_hw[0], image_hw[1]
    )
    train_valid = exists & valid
    proposal = exists if cfg.allow_edge_proposals else train_valid
    return proposal.astype(jnp.float32), train_valid.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Training step
# ---------------------------------------------------------------------------


def compute_losses(
    model: FasterRCNN,
    params,
    batch: Batch,
    rng: jax.Array,
    cfg: ModelConfig,
    grid,
) -> Tuple[jnp.ndarray, Losses]:
    """Loss of one padded batch; differentiable wrt params."""
    centers = jnp.asarray(grid.centers)
    corners = jnp.asarray(grid.corners)

    dropout_rng, sample_rng = jax.random.split(rng)
    bound = lambda method, *a, **k: model.apply(
        {"params": params}, *a, method=method, rngs={"dropout": dropout_rng}, **k
    )

    fm, logits, deltas = bound(FasterRCNN.features_and_rpn, batch.images)
    b = logits.shape[0]

    def per_image(lg, dl, hw, gt_boxes, gt_classes, gt_mask, key):
        prop_mask, train_valid = proposal_masks(cfg, grid, hw)
        proposals = generate_proposals(
            jax.lax.stop_gradient(lg),
            jax.lax.stop_gradient(dl),  # proposals are constants (rpn.py:115)
            centers,
            prop_mask,
            hw[0],
            hw[1],
            cfg.rpn.pre_nms_train,
            cfg.rpn.post_nms_train,
            cfg.rpn.nms_iou_threshold,
            cfg.rpn.min_proposal_side,
            use_pallas=nms_ops.default_backend_uses_pallas(),
        )
        targets = anchor_ops.generate_rpn_targets(
            centers,
            corners,
            train_valid > 0,
            gt_boxes,
            gt_mask,
            cfg.rpn.object_iou_threshold,
            cfg.rpn.background_iou_threshold,
        )
        k1, k2 = jax.random.split(key)
        minibatch = sampling_ops.sample_rpn_minibatch(
            k1,
            targets.trainable,
            targets.objectness,
            cfg.rpn.minibatch_size,
            cfg.rpn.max_positive_fraction,
        )
        samples = sampling_ops.label_and_sample_proposals(
            k2,
            proposals.boxes,
            proposals.valid,
            gt_boxes,
            gt_classes,
            gt_mask,
            cfg.detector.proposal_batch_size,
            cfg.detector.positive_fraction,
            cfg.detector.min_object_iou,
            cfg.detector.min_background_iou,
            cfg.detector.delta_means,
            cfg.detector.delta_stds,
        )
        return targets, minibatch, samples

    keys = jax.random.split(sample_rng, b)
    targets, minibatch, samples = jax.vmap(per_image)(
        logits,
        deltas,
        batch.image_hw,
        batch.gt_boxes,
        batch.gt_classes,
        batch.gt_mask,
        keys,
    )

    class_logits, box_deltas = bound(
        FasterRCNN.detect_rois,
        fm,
        jax.lax.stop_gradient(samples.boxes),
        batch.image_hw,
        deterministic=cfg.detector.dropout == 0.0,
        use_pallas_roi=pallas_pkg.use_roi_kernel(),
    )

    def per_image_losses(lg, dl, tgt_obj, tgt_dl, mb, cls_lg, box_dl, smp):
        return Losses(
            rpn_class=loss_fns.rpn_class_loss(lg, tgt_obj, mb),
            rpn_regression=loss_fns.rpn_regression_loss(
                dl, tgt_dl, tgt_obj, mb, cfg.rpn.regression_sigma
            ),
            detector_class=loss_fns.detector_class_loss(
                cls_lg, smp.classes, smp.weights, smp.count
            ),
            detector_regression=loss_fns.detector_regression_loss(
                box_dl,
                smp.classes,
                smp.deltas,
                smp.weights,
                smp.count,
                cfg.detector.regression_sigma,
            ),
        )

    per = jax.vmap(per_image_losses)(
        logits,
        deltas,
        targets.objectness,
        targets.deltas,
        minibatch,
        class_logits,
        box_deltas,
        samples,
    )
    # Weighted mean over images: padding images (sample_weight 0) are priced
    # into the compute but contribute nothing to the loss or gradients.
    w = batch.sample_weight
    denom = jnp.sum(w) + 1e-7
    mean = Losses(*(jnp.sum(v * w) / denom for v in per))
    return mean.total, mean


def make_train_step(model: FasterRCNN, tx, canvas_h: int, canvas_w: int):
    """Build the donated, jitted train step for one canvas bucket."""
    cfg = model.cfg
    grid = anchor_grid_for(cfg, canvas_h, canvas_w)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch: Batch, rng: jax.Array):
        (_, losses), grads = jax.value_and_grad(
            lambda p: compute_losses(model, p, batch, rng, cfg, grid),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, losses

    return train_step


# ---------------------------------------------------------------------------
# Packed train step (the production Engine path)
# ---------------------------------------------------------------------------
#
# Every host->device array and every eager device op in the train loop costs
# one backend round trip, and on a tunneled backend that latency swings from
# ~5 ms to ~80 ms with load. The Batch API costs 6 transfers + a per-step
# rng split + a per-step loss stack = ~9 interactions per step. The packed
# path folds everything except the big uint8 image tensor into ONE (B, K)
# f32 aux array (step index included, so the rng fold-in happens inside the
# jit) and returns the stacked (4,) loss vector from the same program:
# 2 transfers + 1 execute per step, nothing else.


def aux_width(max_gt: int) -> int:
    """Columns of the packed aux array: hw(2) + boxes(4G) + classes(G) +
    mask(G) + sample_weight(1) + step_idx(1)."""
    return 2 + 6 * max_gt + 2


def pack_aux(hb, step_idx: int) -> np.ndarray:
    """Host-side packing of everything in Batch except images.

    gt classes (< 21) and the step index (< 2^24) are exact in f32.
    """
    b = hb.images.shape[0]
    g = hb.gt_boxes.shape[1]
    return np.concatenate(
        [
            np.asarray(hb.image_hw, np.float32),
            np.asarray(hb.gt_boxes, np.float32).reshape(b, g * 4),
            np.asarray(hb.gt_classes, np.float32),
            np.asarray(hb.gt_mask, np.float32),
            np.asarray(hb.sample_weight, np.float32).reshape(b, 1),
            np.full((b, 1), float(step_idx), np.float32),
        ],
        axis=1,
    )


def unpack_aux(images, aux, max_gt: int):
    """(inside jit) -> (Batch, step_idx scalar)."""
    g = max_gt
    b = aux.shape[0]
    assert aux.shape[1] == aux_width(g), (
        f"packed aux width {aux.shape[1]} != aux_width({g})={aux_width(g)}; "
        "pack_aux and unpack_aux layouts have drifted"
    )
    batch = Batch(
        images=images,
        image_hw=aux[:, 0:2],
        gt_boxes=aux[:, 2 : 2 + 4 * g].reshape(b, g, 4),
        gt_classes=aux[:, 2 + 4 * g : 2 + 5 * g].astype(jnp.int32),
        gt_mask=aux[:, 2 + 5 * g : 2 + 6 * g],
        sample_weight=aux[:, 2 + 6 * g],
    )
    return batch, aux[0, 2 + 6 * g + 1].astype(jnp.int32)


def make_train_step_packed(model: FasterRCNN, tx, canvas_h: int, canvas_w: int):
    """Packed-aux twin of make_train_step (same loss graph by construction:
    both call compute_losses). Returns (params, opt_state, losses,
    loss_vec) where loss_vec is the (4,) stacked vector for device-side
    stats buffering."""
    cfg = model.cfg
    grid = anchor_grid_for(cfg, canvas_h, canvas_w)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, aux, base_rng):
        batch, step_idx = unpack_aux(images, aux, cfg.max_gt_boxes)
        rng = jax.random.fold_in(base_rng, step_idx)
        (_, losses), grads = jax.value_and_grad(
            lambda p: compute_losses(model, p, batch, rng, cfg, grid),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, losses, jnp.stack(list(losses))

    return train_step


def make_train_step_scan(
    model: FasterRCNN, tx, canvas_h: int, canvas_w: int, k: int
):
    """K optimizer steps per dispatch: the packed step under `jax.lax.scan`.

    The packed step cut per-step host<->device traffic to 2 uploads + 1
    execute, but under degraded tunnel latency even that serializes ~3 wire
    round trips against a ~75 ms device step (the 8x epoch-vs-step gap in
    BENCH_r03). This program amortizes them over K steps: ONE stacked
    (K, B, ...) upload per tensor and ONE dispatch run K full optimizer
    steps, so wire cost per step drops by K-fold and the epoch rate tracks
    the isolated step rate under any backend weather.

    Semantics are identical to K sequential make_train_step_packed calls by
    construction: the scan body IS the packed step's graph (same
    compute_losses, same per-step rng fold-in of the step index packed in
    aux). Parity is asserted in tests/test_model.py::
    test_scan_step_matches_packed_steps.

    Returns train_k(params, opt_state, images_k (K,B,H,W,3) u8,
    aux_k (K,B,W) f32, base_rng) -> (params, opt_state, loss_block (K,4)).
    HBM staging cost: K * B * canvas bytes (K=8, B=8, 608x800 ~= 93 MB).
    """
    cfg = model.cfg
    grid = anchor_grid_for(cfg, canvas_h, canvas_w)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_k(params, opt_state, images_k, aux_k, base_rng):
        def body(carry, xs):
            params, opt_state = carry
            images, aux = xs
            batch, step_idx = unpack_aux(images, aux, cfg.max_gt_boxes)
            rng = jax.random.fold_in(base_rng, step_idx)
            (_, losses), grads = jax.value_and_grad(
                lambda p: compute_losses(model, p, batch, rng, cfg, grid),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return (params, opt_state), jnp.stack(list(losses))

        (params, opt_state), loss_block = jax.lax.scan(
            body, (params, opt_state), (images_k, aux_k)
        )
        return params, opt_state, loss_block

    return train_k


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def make_predict_fn(model: FasterRCNN, canvas_h: int, canvas_w: int):
    """Build the jitted fixed-shape inference function for one canvas.

    Implements the reference predict pipeline (faster_rcnn.py:135-226):
    forward with infer NMS caps, per-class delta decode with stds
    [.1,.1,.2,.2], clip to [0, dim-1], score threshold, per-class NMS at
    IoU 0.3 — all on device, batched.
    """
    cfg = model.cfg
    grid = anchor_grid_for(cfg, canvas_h, canvas_w)
    centers = jnp.asarray(grid.centers)
    num_fg = cfg.num_classes - 1
    # 0 = uncapped: every per-class NMS survivor fits (reference keeps all
    # survivors, faster_rcnn.py:213-226; survivors <= proposals by construction).
    max_det = cfg.detector.max_detections_per_class or cfg.rpn.post_nms_infer

    @functools.partial(jax.jit, static_argnames=("score_threshold",))
    def predict(params, images, image_hw, score_threshold: float = 0.05):
        fm, logits, deltas = model.apply(
            {"params": params},
            images,
            method=FasterRCNN.features_and_rpn,
        )

        props = jax.vmap(
            lambda lg, dl, hw: generate_proposals(
                lg,
                dl,
                centers,
                proposal_masks(cfg, grid, hw)[0],
                hw[0],
                hw[1],
                cfg.rpn.pre_nms_infer,
                cfg.rpn.post_nms_infer,
                cfg.rpn.nms_iou_threshold,
                cfg.rpn.min_proposal_side,
                use_pallas=nms_ops.default_backend_uses_pallas(),
            )
        )(logits, deltas, image_hw)

        class_logits, box_deltas = model.apply(
            {"params": params},
            fm,
            props.boxes,
            image_hw,
            method=FasterRCNN.detect_rois,
            use_pallas_roi=pallas_pkg.use_roi_kernel(),
        )
        class_probs = jax.nn.softmax(class_logits, axis=-1)  # (B, S, C)

        def per_image(boxes, valid, probs, deltas_flat, hw):
            s = boxes.shape[0]
            anchors_ctr = box_ops.corners_to_centers(boxes)
            per_class_deltas = deltas_flat.reshape(s, num_fg, 4)

            def per_class(cls_deltas, cls_scores):
                decoded = box_ops.decode_deltas(
                    cls_deltas,
                    anchors_ctr,
                    cfg.detector.delta_means,
                    cfg.detector.delta_stds,
                )
                # Predict-time clip is to [0, dim-1] (faster_rcnn.py:200-201).
                decoded = box_ops.clip_to_image(decoded, hw[0] - 1.0, hw[1] - 1.0)
                keep = (cls_scores > score_threshold) & (valid > 0)
                # Per-class NMS stays on the XLA blocked path: it is 640
                # small problems (B*20 x K=300) that vectorize across the
                # vmap, where per-problem Pallas kernels would serialize.
                # block_size 64 measured ~25% faster than the default 256 at
                # K=300 (less block padding), identical outputs.
                res = nms_ops.nms(
                    decoded,
                    cls_scores,
                    keep,
                    iou_threshold=cfg.detector.test_nms_iou_threshold,
                    max_outputs=max_det,
                    block_size=64,
                )
                return res.boxes, res.scores, res.valid

            cls_deltas = jnp.moveaxis(per_class_deltas, 1, 0)  # (C-1, S, 4)
            cls_scores = jnp.moveaxis(probs[:, 1:], 1, 0)  # (C-1, S)
            return jax.vmap(per_class)(cls_deltas, cls_scores)

        boxes, scores, valid = jax.vmap(per_image)(
            props.boxes, props.valid, class_probs, box_deltas, image_hw
        )
        return Detections(boxes=boxes, scores=scores, valid=valid)

    def predict_with_b8_workaround(
        params, images, image_hw, score_threshold: float = 0.05
    ):
        # KNOWN BACKEND FAULT, single-chip TPU only: the fully-compiled
        # predict program at batch EXACTLY 8 (608x800, any kernel backend,
        # any per-class cap) crashes the TPU worker on the current
        # axon/libtpu stack, while B=4/16/32 run fine and every predict
        # substage run as its own program at B=8 also runs fine — i.e. a
        # compiler fusion/scheduling bug, not a semantics bug (bisect
        # evidence: round-3 logs /tmp/stage_*.log; Pallas NMS/RoI on/off
        # made no difference, per-class cap 100 vs 300 made no difference).
        # Mitigation: run a B=8 batch as two B=4 halves of the SAME jitted
        # program — predict is vmapped per image, so the concatenated
        # result is bit-identical to the fused B=8 batch. Costs one extra
        # dispatch; compute is unchanged. Scope: single-device TPU runs
        # (meshes shard the batch; the per-device shape differs from 8).
        on_single_tpu = (
            jax.default_backend() == "tpu" and jax.device_count() == 1
        )
        forced = bool(os.environ.get("FRCNN_FORCE_PREDICT_B8_SPLIT"))
        if (
            images.shape[0] == 8
            and (on_single_tpu or forced)
            and not os.environ.get("FRCNN_NO_PREDICT_B8_SPLIT")
        ):
            lo = predict(
                params, images[:4], image_hw[:4], score_threshold=score_threshold
            )
            hi = predict(
                params, images[4:], image_hw[4:], score_threshold=score_threshold
            )
            return Detections(
                boxes=jnp.concatenate([lo.boxes, hi.boxes]),
                scores=jnp.concatenate([lo.scores, hi.scores]),
                valid=jnp.concatenate([lo.valid, hi.valid]),
            )
        return predict(
            params, images, image_hw, score_threshold=score_threshold
        )

    return predict_with_b8_workaround


def init_params(model: FasterRCNN, canvas_h: int, canvas_w: int, seed: int = 0):
    """Initialize parameters with dummy inputs on the given canvas."""
    images = jnp.zeros((1, canvas_h, canvas_w, 3), jnp.uint8)
    hw = jnp.asarray([[float(canvas_h), float(canvas_w)]], jnp.float32)
    variables = model.init(
        {"params": jax.random.key(seed), "dropout": jax.random.key(seed + 1)},
        images,
        hw,
    )
    return variables["params"]
