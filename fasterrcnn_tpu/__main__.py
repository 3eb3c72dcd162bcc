"""CLI driver: python -m fasterrcnn_tpu --help

One CLI replacing both reference drivers (pytorch/FasterRCNN/__main__.py:260-332
and tf2/FasterRCNN/__main__.py:317-407): same mutually-exclusive procedures
(--train / --eval / --predict / --predict-to-file / --predict-all /
--dump-anchors), same hyperparameter flags and defaults, plus the tf2 tree's
optimizer extras (--optimizer, --clipnorm, --beta1, --beta2) and TPU-specific
additions (--batch-size, --compute-dtype, --synthetic, --profile-dir).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("fasterrcnn_tpu")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--train", action="store_true", help="Train model")
    group.add_argument("--eval", action="store_true", help="Evaluate model")
    group.add_argument("--predict", metavar="url", type=str,
                       help="Run inference on image and display detected boxes")
    group.add_argument("--predict-to-file", metavar="url", type=str,
                       help="Run inference and render boxes to 'predictions.png'")
    group.add_argument("--predict-all", metavar="name", type=str,
                       help="Run inference on all images in a split, write to "
                            "'predictions_<split>/'")
    parser.add_argument("--load-from", metavar="file",
                        help="Load initial model weights from file (msgpack, "
                             "Caffe/Keras VGG-16, torchvision ResNet, or full "
                             "reference .pth checkpoint)")
    parser.add_argument("--backbone", metavar="model", default="vgg16",
                        choices=["vgg16", "vgg16-torch", "resnet50",
                                 "resnet101", "resnet152"],
                        help="Backbone model for feature extraction")
    parser.add_argument("--save-to", metavar="file",
                        help="Save final trained weights to file")
    parser.add_argument("--save-best-to", metavar="file",
                        help="Save best weights (highest mAP) to file")
    parser.add_argument("--dataset-dir", metavar="dir", default="VOCdevkit/VOC2007",
                        help="VOC dataset directory")
    parser.add_argument("--train-split", metavar="name", default="trainval")
    parser.add_argument("--eval-split", metavar="name", default="test")
    parser.add_argument("--cache-images", action="store_true",
                        help="Cache resized images in memory across epochs")
    parser.add_argument("--periodic-eval-samples", metavar="count", type=int,
                        default=1000, help="Eval sample count after each epoch")
    parser.add_argument("--checkpoint-dir", metavar="dir",
                        help="Save per-epoch orbax checkpoints into this "
                             "directory (enables --resume)")
    parser.add_argument("--resume", action="store_true",
                        help="Resume weights from the newest checkpoint in "
                             "--checkpoint-dir (optimizer restarts fresh, "
                             "honoring the current --learning-rate)")
    parser.add_argument("--plot", action="store_true",
                        help="Plot per-class average precision after eval")
    parser.add_argument("--log-csv", metavar="file",
                        help="Log training metrics to CSV file")
    parser.add_argument("--epochs", metavar="count", type=int, default=1)
    parser.add_argument("--learning-rate", metavar="value", type=float, default=1e-3)
    parser.add_argument("--momentum", metavar="value", type=float, default=0.9)
    parser.add_argument("--weight-decay", metavar="value", type=float, default=5e-4)
    parser.add_argument("--dropout", metavar="probability", type=float, default=0.0,
                        help="Dropout after the two detector FC layers (VGG-16)")
    parser.add_argument("--optimizer", metavar="name", default="sgd",
                        choices=["sgd", "adam"], help="Optimizer (tf2 parity)")
    parser.add_argument("--clipnorm", metavar="value", type=float, default=0.0,
                        help="Gradient norm clipping (tf2 parity)")
    parser.add_argument("--beta1", metavar="value", type=float, default=0.9)
    parser.add_argument("--beta2", metavar="value", type=float, default=0.999)
    parser.add_argument("--lr-schedule", metavar="name", default="constant",
                        choices=["constant", "cosine"],
                        help="Learning-rate schedule: constant (reference "
                             "behavior) or cosine (linear warmup over "
                             "--warmup-steps, cosine decay to 0 over the "
                             "whole run; the from-scratch recipe)")
    parser.add_argument("--warmup-steps", metavar="n", type=int, default=0,
                        help="Linear LR warmup steps (cosine schedule only)")
    parser.add_argument("--train-all", action="store_true",
                        help="Train every parameter (from-scratch mode): "
                             "disable the backbone freeze patterns, which "
                             "exist to protect pretrained weights the box "
                             "may not have; fresh ResNets also zero-init "
                             "each bottleneck's final BN scale")
    parser.add_argument("--no-augment", action="store_true",
                        help="Disable random horizontal flips during training")
    parser.add_argument("--exclude-edge-proposals", action="store_true",
                        help="Exclude proposals at image-boundary anchors")
    parser.add_argument("--dump-anchors", metavar="dir",
                        help="Render anchors + ground truth from the training "
                             "set into a directory")
    parser.add_argument("--batch-size", metavar="n", type=int, default=1,
                        help="Training batch size (per canvas bucket)")
    parser.add_argument("--eval-batch-size", metavar="n", type=int, default=8)
    parser.add_argument("--compute-dtype", metavar="dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="Conv/matmul compute dtype")
    parser.add_argument("--synthetic", metavar="count", type=int, default=0,
                        help="Use a synthetic dataset of N samples instead of "
                             "VOC (no dataset required)")
    parser.add_argument("--seed", metavar="n", type=int, default=0)
    parser.add_argument("--custom-roi-pool", action="store_true",
                        help="Use exact RoIPool quantization instead of "
                             "crop-and-resize (tf2 parity flag; use when "
                             "loading RoIPool-trained reference checkpoints)")
    parser.add_argument("--tiny", action="store_true",
                        help="Smoke-test mode: small synthetic images and "
                             "reduced proposal caps (fast compile; CI use)")
    parser.add_argument("--memory-stats", action="store_true",
                        help="Print per-device live/peak memory after the "
                             "first epoch plus XLA's memory analysis of the "
                             "compiled train step (analog of the reference's "
                             "CUDA memory profiler, its __main__.py:288)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans for the whole training "
                             "run: raise at the first NaN-producing op "
                             "inside jit (slower; debug runs only)")
    parser.add_argument("--profile-dir", metavar="dir",
                        help="Capture a jax.profiler trace of training steps "
                             "into this directory (view with xprof/tensorboard)")
    parser.add_argument("--num-devices", metavar="n", type=int, default=0,
                        help="Shard work over the first n devices of a "
                             "(dp, tp) jax mesh (0 = single device). "
                             "batch sizes must divide by n/tp")
    parser.add_argument("--tp", metavar="n", type=int, default=1,
                        help="Tensor-parallel extent of the mesh (megatron "
                             "split of the detector fc pair); must divide "
                             "--num-devices")
    return parser


def make_datasets(options):
    """(train_dataset, eval_dataset) per flags; synthetic fallback."""
    if options.synthetic:
        from fasterrcnn_tpu.data.synthetic import SyntheticDataset

        h, w = (120, 150) if options.tiny else (600, 800)
        train = SyntheticDataset(num_samples=options.synthetic, height=h,
                                 width=w, seed=options.seed)
        evald = SyntheticDataset(num_samples=max(options.synthetic // 4, 1),
                                 height=h, width=w, seed=options.seed + 1)
        return train, evald

    from fasterrcnn_tpu.data.voc import Dataset

    train = Dataset(
        split=options.train_split,
        dir=options.dataset_dir,
        augment=not options.no_augment,
        shuffle=True,
        cache=options.cache_images,
        seed=options.seed,
    )
    evald = Dataset(
        split=options.eval_split,
        dir=options.dataset_dir,
        augment=False,
        shuffle=False,
        cache=False,
    )
    return train, evald


def main(argv=None):
    options = build_parser().parse_args(argv)

    from fasterrcnn_tpu.config import DetectorConfig, ModelConfig, TrainConfig
    from fasterrcnn_tpu.engine import Engine
    from fasterrcnn_tpu.utils.csv_log import CSVLog

    if options.tiny:
        from fasterrcnn_tpu.config import AnchorConfig, RPNConfig

        model_cfg = ModelConfig(
            backbone=options.backbone,
            allow_edge_proposals=not options.exclude_edge_proposals,
            compute_dtype=options.compute_dtype,
            # Anchors scaled to the tiny images (the standard 128/256/512px
            # pyramid exceeds a 120x150 image entirely).
            anchors=AnchorConfig(areas=(24.0 * 24, 48.0 * 48, 96.0 * 96)),
            rpn=RPNConfig(
                pre_nms_train=400, post_nms_train=128,
                pre_nms_infer=200, post_nms_infer=64, minibatch_size=64,
            ),
            detector=DetectorConfig(
                dropout=options.dropout,
                proposal_batch_size=32,
            ),
            max_gt_boxes=8,
            roi_mode="exact_pool" if options.custom_roi_pool else "crop",
            train_all=options.train_all,
        )
    else:
        model_cfg = ModelConfig(
            backbone=options.backbone,
            allow_edge_proposals=not options.exclude_edge_proposals,
            compute_dtype=options.compute_dtype,
            detector=DetectorConfig(dropout=options.dropout),
            roi_mode="exact_pool" if options.custom_roi_pool else "crop",
            train_all=options.train_all,
        )
    train_cfg = TrainConfig(
        learning_rate=options.learning_rate,
        momentum=options.momentum,
        weight_decay=options.weight_decay,
        epochs=options.epochs,
        augment=not options.no_augment,
        batch_size=options.batch_size,
        clipnorm=options.clipnorm,
        optimizer=options.optimizer,
        beta1=options.beta1,
        beta2=options.beta2,
        lr_schedule=options.lr_schedule,
        warmup_steps=options.warmup_steps,
    )
    if options.lr_schedule == "cosine" and options.train:
        import dataclasses as _dc

        n = make_datasets(options)[0].num_samples
        steps_per_epoch = -(-n // options.batch_size)
        train_cfg = _dc.replace(
            train_cfg, total_steps=options.epochs * steps_per_epoch
        )
    mesh = None
    if options.num_devices or options.tp > 1:
        from fasterrcnn_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(options.num_devices or None, tp=options.tp)
        print(
            "Device mesh       : dp=%d x tp=%d" % (mesh.shape["dp"], mesh.shape["tp"])
        )

    engine = Engine(
        model_cfg,
        train_cfg,
        seed=options.seed,
        init_canvas=(128, 160) if options.tiny else (608, 800),
        mesh=mesh,
    )
    if options.load_from:
        engine.load_weights(options.load_from)

    if options.dump_anchors:
        dump_anchors(engine, options)

    if options.train:
        train(engine, options)
    elif options.eval:
        _, eval_data = make_datasets(options)
        engine.evaluate(
            eval_data,
            batch_size=options.eval_batch_size,
            print_average_precisions=True,
            plot=options.plot,
        )
    elif options.predict:
        predict_one(engine, options.predict, show_image=True, output_path=None)
    elif options.predict_to_file:
        predict_one(engine, options.predict_to_file, show_image=False,
                    output_path="predictions.png")
    elif options.predict_all:
        predict_all(engine, options)
    elif not options.dump_anchors:
        print("Nothing to do. Did you mean to use --train or --predict?")


def train(engine, options):
    from fasterrcnn_tpu.utils.checkpoint import (
        BestWeightsTracker,
        TrainCheckpointManager,
    )
    from fasterrcnn_tpu.utils.csv_log import CSVLog
    from fasterrcnn_tpu.utils.stats import TrainingStatistics

    train_data, eval_data = make_datasets(options)
    print("Training Parameters")
    print("-------------------")
    print("Initial weights   : %s" % (options.load_from or "none (random init)"))
    print("Dataset           : %s" % ("synthetic" if options.synthetic else options.dataset_dir))
    print("Backbone          : %s" % options.backbone)
    print("Epochs            : %d" % options.epochs)
    print("Batch size        : %d" % options.batch_size)
    print("Optimizer         : %s" % options.optimizer)
    print("Learning rate     : %f" % options.learning_rate)
    print("Momentum          : %f" % options.momentum)
    print("Weight decay      : %f" % options.weight_decay)
    print("Dropout           : %f" % options.dropout)
    print("Compute dtype     : %s" % options.compute_dtype)
    print("Augmentation      : %s" % ("disabled" if options.no_augment else "enabled"))
    print("Edge proposals    : %s" % ("excluded" if options.exclude_edge_proposals else "included"))
    print("CSV log           : %s" % (options.log_csv or "none"))
    print("Checkpoints       : %s" % (options.checkpoint_dir or "disabled"))
    print("Final weights file: %s" % (options.save_to or "none"))
    print("Best weights file : %s" % (options.save_best_to or "none"))

    csv = CSVLog(options.log_csv) if options.log_csv else None
    best = BestWeightsTracker(options.save_best_to) if options.save_best_to else None
    ckpt_mgr = None
    start_epoch = 1
    if options.checkpoint_dir:
        ckpt_mgr = TrainCheckpointManager(options.checkpoint_dir)
        if options.resume:
            restored = ckpt_mgr.restore_latest(engine.params)
            if restored is not None:
                restored_params, last_epoch = restored
                # set_params re-applies mesh shardings and restarts the
                # optimizer (weights-only resume, reference README.md:231-256).
                engine.set_params(restored_params)
                start_epoch = last_epoch + 1

    profiling = False
    if options.profile_dir:
        import jax

        jax.profiler.start_trace(options.profile_dir)
        profiling = True

    import contextlib

    from fasterrcnn_tpu.utils import profiling as prof_lib

    guard = prof_lib.nan_guard() if options.debug_nans else contextlib.nullcontext()
    guard.__enter__()
    try:
      for epoch in range(start_epoch, 1 + options.epochs):
        print("Epoch %d/%d" % (epoch, options.epochs))
        stats = engine.train_epoch(train_data, options.batch_size)
        if epoch == start_epoch and hasattr(train_data, "cache_nbytes"):
            nb = train_data.cache_nbytes()
            if nb:
                print(
                    "Image cache       : %.1f MiB (%d images, one unflipped "
                    "array each; flips are views)"
                    % (nb / 2**20, len(train_data._cache))
                )
        if epoch == start_epoch and options.memory_stats:
            for dev, ms in prof_lib.device_memory_summary().items():
                print(
                    "Device memory     : %s in_use=%.1f MiB peak=%.1f MiB "
                    "limit=%.1f MiB"
                    % (dev, ms["bytes_in_use_mb"], ms["peak_bytes_in_use_mb"],
                       ms["bytes_limit_mb"])
                )
            for canvas in engine.compiled_canvases():
                mem = engine.train_step_memory_analysis(
                    canvas, options.batch_size
                )
                if mem:
                    print(
                        "Train step memory : canvas=%s temp=%.1f MiB "
                        "args=%.1f MiB out=%.1f MiB code=%.1f MiB"
                        % (canvas, mem["temp_mb"], mem["argument_mb"],
                           mem["output_mb"], mem["generated_code_mb"])
                    )
        if profiling:
            import jax

            jax.profiler.stop_trace()
            profiling = False
            print(f"Wrote profiler trace to {options.profile_dir}")
        mean_ap = engine.evaluate(
            eval_data,
            batch_size=options.eval_batch_size,
            num_samples=options.periodic_eval_samples,
        )
        if ckpt_mgr is not None:
            ckpt_mgr.save(epoch, engine.params, mean_ap)
        if csv:
            log_items = {
                "epoch": epoch,
                "learning_rate": options.learning_rate,
                "momentum": options.momentum,
                "weight_decay": options.weight_decay,
                "dropout": options.dropout,
                "mAP": mean_ap,
            }
            log_items.update(stats.get_progbar_postfix())
            csv.log(log_items)
        if best:
            best.on_epoch_end(engine.params, epoch, mean_ap)
    finally:
        guard.__exit__(None, None, None)
    if ckpt_mgr is not None:
        ckpt_mgr.close()
    if options.save_to:
        engine.save_weights(options.save_to)
    if best:
        best.save_best_weights()
    print(
        "Evaluating %s model on all samples in '%s'..."
        % ("best" if options.save_best_to else "final",
           getattr(eval_data, "split", "eval"))
    )
    engine.evaluate(
        eval_data,
        batch_size=options.eval_batch_size,
        print_average_precisions=True,
        plot=options.plot,
    )


def predict_one(engine, url, show_image, output_path):
    from fasterrcnn_tpu.data import image as image_lib
    from fasterrcnn_tpu.data.voc import Sample, CLASS_INDEX_TO_NAME
    from fasterrcnn_tpu.utils import visualize

    image_u8, pil_image, _, _ = image_lib.load_image(
        url, min_dimension_pixels=600, max_dimension_pixels=1600
    )
    sample = Sample(
        image_u8=image_u8,
        image_hw=(image_u8.shape[0], image_u8.shape[1]),
        gt_boxes=[],
        filepath=url,
    )
    scored = engine.predict_image(sample, score_threshold=0.7)
    visualize.show_detections(
        image=pil_image,
        scored_boxes_by_class_index=scored,
        class_index_to_name=CLASS_INDEX_TO_NAME,
        output_path=output_path,
        show_image=show_image,
    )


def predict_all(engine, options):
    from fasterrcnn_tpu.data.voc import Dataset, CLASS_INDEX_TO_NAME
    from fasterrcnn_tpu.utils import visualize

    split = options.predict_all
    dirname = "predictions_" + split
    os.makedirs(dirname, exist_ok=True)
    print("Rendering predictions from '%s' set to '%s'..." % (split, dirname))
    dataset = Dataset(split=split, dir=options.dataset_dir, augment=False, shuffle=False)
    for sample in dataset:
        scored = engine.predict_image(sample, score_threshold=0.7)
        base = os.path.splitext(os.path.basename(sample.filepath))[0]
        visualize.show_detections(
            image=sample.image,
            scored_boxes_by_class_index=scored,
            class_index_to_name=CLASS_INDEX_TO_NAME,
            output_path=os.path.join(dirname, base + ".png"),
        )


def dump_anchors(engine, options):
    """Render anchors + gt from the training set (reference __main__.py:38-60)."""
    import jax.numpy as jnp

    from fasterrcnn_tpu.config import select_canvas
    from fasterrcnn_tpu.models.faster_rcnn import anchor_grid_for, proposal_masks
    from fasterrcnn_tpu.ops import anchors as anchor_ops
    from fasterrcnn_tpu.utils import visualize

    train_data, _ = make_datasets(options)
    os.makedirs(options.dump_anchors, exist_ok=True)
    print("Rendering anchors from '%s' to '%s'..."
          % (getattr(train_data, "split", "train"), options.dump_anchors))
    for sample in train_data:
        canvas = select_canvas(*sample.image_hw)
        grid = anchor_grid_for(engine.model_cfg, *canvas)
        hw = jnp.asarray([float(sample.image_hw[0]), float(sample.image_hw[1])])
        _, train_valid = proposal_masks(engine.model_cfg, grid, hw)
        gt_corners = np.zeros((engine.model_cfg.max_gt_boxes, 4), np.float32)
        gt_mask = np.zeros((engine.model_cfg.max_gt_boxes,), np.float32)
        for i, b in enumerate(sample.gt_boxes):
            gt_corners[i] = b.corners
            gt_mask[i] = 1.0
        targets = anchor_ops.generate_rpn_targets(
            jnp.asarray(grid.centers),
            jnp.asarray(grid.corners),
            train_valid > 0,
            jnp.asarray(gt_corners),
            jnp.asarray(gt_mask),
        )
        positive = np.asarray(targets.trainable * targets.objectness)
        out = os.path.join(
            options.dump_anchors,
            "anchors_" + os.path.basename(sample.filepath).replace("/", "_") + ".png",
        )
        # Deferred-decode samples (native loader, no --cache-images) carry no
        # pixels until batch time; materialize them here so rendering always
        # happens, matching the reference (__main__.py:38-60 always renders).
        sample.materialize()
        visualize.show_anchors(
            image=sample.image,
            anchor_centers=grid.centers,
            positive_mask=positive,
            gt_boxes=sample.gt_boxes,
            output_path=out,
        )


if __name__ == "__main__":
    main()
