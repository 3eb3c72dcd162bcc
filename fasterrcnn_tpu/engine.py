"""Training / evaluation orchestration (the reference's __main__ train() and
evaluate() loops, pytorch __main__.py:62-224, re-built around jit programs).

Key differences from the reference driver:
  * Batches of any size, grouped per canvas bucket; one compiled train step
    per (bucket, batch-size) pair, cached.
  * The optimizer is optax: SGD with momentum, decoupled weight decay applied
    only to kernels (the reference decays only '*weight*' params,
    __main__.py:98-105), and backbone-specific frozen parameters held out
    via optax.multi_transform. Optional Adam + clipnorm mirror the tf2 tree
    (tf2 __main__.py:304-314,337-341).
  * Evaluation runs the fixed-shape predict program and feeds the
    protocol-exact mAP calculator (utils/stats.py).
"""

from __future__ import annotations

import os
import re
import sys
import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fasterrcnn_tpu.config import ModelConfig, TrainConfig
from fasterrcnn_tpu.data.pipeline import Prefetcher, batched
from fasterrcnn_tpu.models.backbone import get_backbone
from fasterrcnn_tpu.models.faster_rcnn import (
    Batch,
    FasterRCNN,
    init_params,
    make_predict_fn,
    make_train_step,
    make_train_step_packed,
    make_train_step_scan,
    pack_aux,
)
from fasterrcnn_tpu.utils import checkpoint as ckpt_lib
from fasterrcnn_tpu.utils import postprocess
from fasterrcnn_tpu.utils.stats import (
    PrecisionRecallCurveCalculator,
    TrainingStatistics,
)


def _param_labels(params, frozen_patterns: Tuple[str, ...]):
    compiled = [re.compile(p) for p in frozen_patterns]

    def label(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        for pat in compiled:
            if pat.match(path):
                return "frozen"
        # Reference: weight decay only on '*weight*' params (__main__.py:100-105).
        if path.endswith("kernel") or path.endswith("scale"):
            return "decayed"
        return "plain"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(model_cfg: ModelConfig, train_cfg: TrainConfig, params):
    spec = get_backbone(model_cfg.backbone)
    # From-scratch mode: no pretrained weights to protect, so nothing frozen.
    patterns = () if model_cfg.train_all else spec.frozen_param_patterns
    labels = _param_labels(params, patterns)

    if train_cfg.lr_schedule == "cosine":
        if train_cfg.total_steps <= 0:
            raise ValueError(
                "lr_schedule='cosine' needs total_steps > 0 (the CLI derives "
                "it from epochs x steps-per-epoch)"
            )
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=train_cfg.learning_rate,
            warmup_steps=max(train_cfg.warmup_steps, 1),
            decay_steps=train_cfg.total_steps,
        )
    else:
        lr = train_cfg.learning_rate

    def base_opt(weight_decay: float):
        steps = []
        if train_cfg.clipnorm > 0:
            steps.append(optax.clip_by_global_norm(train_cfg.clipnorm))
        if weight_decay > 0:
            steps.append(optax.add_decayed_weights(weight_decay))
        if train_cfg.optimizer == "adam":
            steps.append(optax.adam(lr, b1=train_cfg.beta1, b2=train_cfg.beta2))
        else:
            steps.append(optax.sgd(lr, momentum=train_cfg.momentum))
        return optax.chain(*steps)

    tx = optax.multi_transform(
        {
            "decayed": base_opt(train_cfg.weight_decay),
            "plain": base_opt(0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels


class Engine:
    """Holds params/opt state and per-canvas compiled programs.

    Pass a `jax.sharding.Mesh` (parallel/mesh.make_mesh) to scale out:
    parameters are placed per parallel/mesh.param_shardings (replicated
    except the tp-split detector fc pair) and every batch is sharded along
    dp; XLA GSPMD inserts the gradient all-reduce and fc collectives. Batch
    sizes must be divisible by the dp extent.
    """

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig = TrainConfig(),
        seed: int = 0,
        init_canvas: Tuple[int, int] = (608, 800),
        mesh=None,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.model = FasterRCNN(cfg=model_cfg)
        self.mesh = mesh
        self.params = init_params(self.model, *init_canvas, seed=seed)
        self.tx, self.labels = make_optimizer(model_cfg, train_cfg, self.params)
        self.set_params(self.params)
        self._train_steps: Dict[Tuple[int, int], callable] = {}
        self._packed_steps: Dict[Tuple[int, int], callable] = {}
        self._scan_steps: Dict[Tuple[Tuple[int, int], int], callable] = {}
        self._global_step = 0
        self._predict_fns: Dict[Tuple[int, int], callable] = {}
        self._rng = jax.random.key(seed)
        # Phase breakdown of the most recent train_epoch (see train_epoch).
        self.last_epoch_trace: Dict[str, float] = {}

    def set_params(self, params) -> None:
        """Install new parameters: (re-)apply mesh placement, fresh optimizer.

        Every path that replaces params (init, --load-from, --resume) must go
        through here — a host-side tree would otherwise silently lose the
        tp-split fc shardings and the explicit optimizer-state placement.
        The optimizer restarts fresh by design (reference README.md:231-256:
        restoring it clobbers a changed learning rate). Placement is explicit
        because eager init yields equivalent-but-distinct (or uncommitted)
        shardings that recompile the train step at its second call.
        """
        if self.mesh is not None:
            from fasterrcnn_tpu.parallel import mesh as mesh_lib

            mesh_lib.warn_if_tp_unused(self.mesh, params)
            params = jax.device_put(
                params, mesh_lib.param_shardings(self.mesh, params)
            )
            self.params = params
            self.opt_state = self.tx.init(params)
            self.opt_state = jax.device_put(
                self.opt_state,
                mesh_lib.param_shardings(self.mesh, self.opt_state),
            )
        else:
            # Commit to the device even single-chip: checkpoint loaders
            # return HOST numpy trees, and uncommitted inputs are re-uploaded
            # by jit on EVERY call — ~550 MB of VGG-16 weights per predict
            # dispatch over a remote-tunnel backend (measured: a 32-image
            # eval went from ~2 s with device-resident params to minutes
            # with host params after --load-from).
            self.params = jax.device_put(params, jax.devices()[0])
            self.opt_state = self.tx.init(self.params)

    def _check_batch_size(self, batch_size: int) -> None:
        if self.mesh is None:
            return
        dp = self.mesh.shape.get("dp", 1)
        if batch_size % dp != 0:
            raise ValueError(
                f"batch_size={batch_size} is not divisible by the mesh's "
                f"dp extent {dp}; every batch is sharded along dp "
                "(residues are padded to batch_size, so only the full size "
                "must divide)"
            )

    # -- weights ----------------------------------------------------------

    def load_weights(self, filepath: str) -> None:
        self.set_params(ckpt_lib.load(self.params, filepath))

    def save_weights(self, filepath: str) -> None:
        ckpt_lib.save_weights(filepath, self.params)

    # -- compiled program caches -------------------------------------------

    def train_step_for(self, canvas_hw: Tuple[int, int]):
        if canvas_hw not in self._train_steps:
            self._train_steps[canvas_hw] = make_train_step(
                self.model, self.tx, *canvas_hw
            )
        return self._train_steps[canvas_hw]

    def compiled_canvases(self):
        """Canvas buckets a train step has been built for (any API)."""
        return sorted(
            set(self._train_steps)
            | set(self._packed_steps)
            | {canvas for canvas, _ in self._scan_steps}
        )

    def packed_step_for(self, canvas_hw: Tuple[int, int]):
        """Single-step packed program: 2 transfers + 1 execute per step
        (see models/faster_rcnn.make_train_step_packed). Used for K-block
        residues and when FRCNN_SCAN_STEPS=1."""
        if canvas_hw not in self._packed_steps:
            self._packed_steps[canvas_hw] = make_train_step_packed(
                self.model, self.tx, *canvas_hw
            )
        return self._packed_steps[canvas_hw]

    def scan_step_for(self, canvas_hw: Tuple[int, int], k: int):
        """The production train-loop program: K optimizer steps per
        dispatch, 2 stacked transfers per K steps (see
        models/faster_rcnn.make_train_step_scan)."""
        if (canvas_hw, k) not in self._scan_steps:
            self._scan_steps[(canvas_hw, k)] = make_train_step_scan(
                self.model, self.tx, *canvas_hw, k
            )
        return self._scan_steps[(canvas_hw, k)]

    def predict_fn_for(self, canvas_hw: Tuple[int, int]):
        if canvas_hw not in self._predict_fns:
            self._predict_fns[canvas_hw] = make_predict_fn(self.model, *canvas_hw)
        return self._predict_fns[canvas_hw]

    def train_step_memory_analysis(self, canvas_hw, batch_size: int) -> dict:
        """XLA memory analysis of the train step at this shape (--memory-stats).

        AOT lower+compile with abstract batch avals; on backends with a
        compilation cache the already-jitted identical program makes this
        cheap."""
        from fasterrcnn_tpu.utils import profiling as prof_lib

        step = self.train_step_for(canvas_hw)
        g = self.model_cfg.max_gt_boxes
        ch, cw = canvas_hw
        sds = jax.ShapeDtypeStruct
        batch = Batch(
            images=sds((batch_size, ch, cw, 3), jnp.uint8),
            image_hw=sds((batch_size, 2), jnp.float32),
            gt_boxes=sds((batch_size, g, 4), jnp.float32),
            gt_classes=sds((batch_size, g), jnp.int32),
            gt_mask=sds((batch_size, g), jnp.float32),
            sample_weight=sds((batch_size,), jnp.float32),
        )
        lowered = step.lower(
            self.params, self.opt_state, batch, jax.random.key(0)
        )
        return prof_lib.compiled_memory_analysis(lowered.compile())

    # -- loops --------------------------------------------------------------

    def train_epoch(
        self,
        dataset: Iterable,
        batch_size: int,
        stats: Optional[TrainingStatistics] = None,
        progress: bool = True,
        max_steps: Optional[int] = None,
    ) -> TrainingStatistics:
        stats = stats or TrainingStatistics()
        self._check_batch_size(batch_size)

        # Host<->device traffic is amortized over K-step blocks
        # (FRCNN_SCAN_STEPS, default 8): K consecutive same-canvas batches
        # are stacked into ONE (K, B, ...) uint8 image tensor + ONE
        # (K, B, W) f32 aux tensor — 2 upload RPCs — and dispatched as ONE
        # lax.scan program running K full optimizer steps
        # (models/faster_rcnn.make_train_step_scan). Under degraded tunnel
        # latency (33-800 ms/RPC on this backend) this is the difference
        # between the epoch rate tracking the step rate and an 8x collapse
        # (BENCH_r03: 13.88 vs 108.58 images/s). Per-bucket residues of
        # fewer than K batches fall back to the single-step packed program.
        # Batch assembly AND the uploads both run in the prefetch thread:
        # measured 46 + 21 ms/step of host work that would otherwise
        # serialize with the ~77 ms device step (they overlap the flush
        # waits below, where the main thread blocks with the GIL released).
        start_step = self._global_step
        scan_k = max(1, int(os.environ.get("FRCNN_SCAN_STEPS", "8")))
        flush_every = int(os.environ.get("FRCNN_LOSS_FLUSH_STEPS", "32"))
        from fasterrcnn_tpu.parallel import mesh as mesh_lib

        def upload(arrays, shard_fn):
            staged = tuple(jnp.asarray(a) for a in arrays)
            if self.mesh is not None:
                staged = jax.device_put(staged, shard_fn(self.mesh, staged))
            return staged

        def upload_step(hb, step_idx):
            images, aux = upload(
                (hb.images, pack_aux(hb, step_idx)), mesh_lib.batch_shardings
            )
            return "step", hb.canvas_hw, images, aux, 1

        def to_device(host_batches):
            # Emitted items: (kind, canvas_hw, images, aux, n_steps) with
            # kind "scan" (stacked (K,B,...) block) or "step" (one batch).
            idx = 0
            pending: Dict[Tuple[int, int], list] = {}
            for hb in host_batches:
                step_idx = start_step + idx
                idx += 1
                if scan_k == 1:
                    yield upload_step(hb, step_idx)
                    continue
                pending.setdefault(hb.canvas_hw, []).append((hb, step_idx))
                block = pending[hb.canvas_hw]
                if len(block) == scan_k:
                    images_k = np.stack([b.images for b, _ in block])
                    aux_k = np.stack([pack_aux(b, si) for b, si in block])
                    pending[hb.canvas_hw] = []
                    images, aux = upload(
                        (images_k, aux_k), mesh_lib.scan_batch_shardings
                    )
                    yield "scan", hb.canvas_hw, images, aux, scan_k
            # Residues: single packed steps (padding a scan block with
            # zero-weight steps is NOT a no-op — momentum still advances).
            for canvas_hw, block in pending.items():
                for hb, step_idx in block:
                    yield upload_step(hb, step_idx)

        # Queue depth covers the loss-flush window in STEPS: while the main
        # thread blocks draining a flush block, the worker can stage an
        # entire next window (at K=8/flush 32 that is 4 stacked blocks
        # ~= 380 MB device memory — cheap).
        batches = Prefetcher(
            to_device(
                batched(iter(dataset), batch_size, self.model_cfg.max_gt_boxes)
            ),
            depth=max(2, flush_every // scan_k),
        )
        bar = None
        if progress:
            from tqdm import tqdm

            total = (getattr(dataset, "num_samples", 0) + batch_size - 1) // batch_size
            bar = tqdm(total=total or None)
        # Loss stats are fetched in BATCHES of steps, not per step: each
        # device->host fetch pays a full backend round trip (measured 33 ms
        # on a good day and ~800 ms under tunnel load). Scan blocks already
        # return device-resident (K, 4) loss blocks; every
        # FRCNN_LOSS_FLUSH_STEPS rows the host concatenates them in one
        # device op and pulls the whole block in ONE round trip, started
        # asynchronously so the wire time overlaps the next steps' compute.
        # No per-step value is lost — only the progress-bar refresh is
        # quantized to the flush cadence.
        buf: list = []  # device blocks, each (n_i, 4)
        buf_rows = 0
        pending_block = None

        def consume(block):
            for row in np.asarray(block):
                stats.on_training_step_values(row)
            if bar is not None:
                bar.set_postfix(stats.get_progbar_postfix())

        def flush():
            # Concatenate the buffered blocks on device, START the D2H
            # copy, and only consume the PREVIOUS block — by the time a
            # block is read on the host its copy has been in flight for a
            # whole flush period, so the round trip overlaps compute
            # instead of stalling.
            nonlocal pending_block, buf_rows
            if not buf:
                return
            block = buf[0] if len(buf) == 1 else jnp.concatenate(buf)
            buf.clear()
            buf_rows = 0
            try:
                block.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            if pending_block is not None:
                consume(pending_block)
            pending_block = block

        # Phase breakdown: time the main thread spends WAITING for staged
        # batches (prefetch-thread bound: host assembly + upload), time
        # inside dispatch calls (one execute RPC each), and the final drain
        # (blocks until the chip finishes the tail). This is the tool that
        # separates "epoch is slow because the loop stalls on the wire" from
        # "epoch is slow because staging can't keep up with the chip". It is
        # always recorded into self.last_epoch_trace (bench.py publishes it,
        # VERDICT r4 Next #3 — two perf_counter calls per block, free);
        # FRCNN_EPOCH_TRACE=1 additionally prints it to stderr.
        trace = os.environ.get("FRCNN_EPOCH_TRACE") == "1"
        t_wait = t_dispatch = 0.0
        t_begin = time.perf_counter()
        steps_done = 0
        try:
            it = iter(batches)
            while True:
                t0 = time.perf_counter()
                try:
                    kind, canvas_hw, images, aux, n = next(it)
                except StopIteration:
                    break
                t_wait += time.perf_counter() - t0
                if max_steps is not None and steps_done >= max_steps:
                    break
                t0 = time.perf_counter()
                if kind == "scan":
                    step = self.scan_step_for(canvas_hw, n)
                    self.params, self.opt_state, loss_block = step(
                        self.params, self.opt_state, images, aux, self._rng
                    )
                    buf.append(loss_block)
                else:
                    step = self.packed_step_for(canvas_hw)
                    self.params, self.opt_state, _losses, loss_vec = step(
                        self.params, self.opt_state, images, aux, self._rng
                    )
                    buf.append(loss_vec[None])
                t_dispatch += time.perf_counter() - t0
                self._global_step += n
                steps_done += n
                buf_rows += n
                if bar is not None:
                    bar.update(n)
                if buf_rows >= flush_every:
                    flush()
            t0 = time.perf_counter()
            flush()
            if pending_block is not None:
                consume(pending_block)
            t_drain = time.perf_counter() - t0
            total = time.perf_counter() - t_begin
            self.last_epoch_trace = {
                "steps": steps_done,
                "total_s": round(total, 3),
                "wait_s": round(t_wait, 3),
                "dispatch_s": round(t_dispatch, 3),
                "drain_s": round(t_drain, 3),
                "other_s": round(total - t_wait - t_dispatch - t_drain, 3),
            }
            if trace:
                print(
                    f"[epoch-trace] steps={steps_done} total={total:.3f}s "
                    f"wait-for-staging={t_wait:.3f}s "
                    f"dispatch-calls={t_dispatch:.3f}s "
                    f"final-drain={t_drain:.3f}s "
                    f"other={total - t_wait - t_dispatch - t_drain:.3f}s",
                    file=sys.stderr,
                    flush=True,
                )
        finally:
            batches.close()
            if bar is not None:
                bar.close()
        return stats

    def evaluate(
        self,
        dataset: Iterable,
        batch_size: int = 8,
        num_samples: Optional[int] = None,
        score_threshold: float = 0.05,
        print_average_precisions: bool = False,
        plot: bool = False,
        progress: bool = True,
    ) -> float:
        calc = PrecisionRecallCurveCalculator()
        self._check_batch_size(batch_size)
        seen = 0
        source = iter(dataset)
        if num_samples is not None:
            # Bound the decode work up front: without this, the prefetch
            # thread would keep decoding the rest of the split after the
            # early exit below.
            import itertools

            source = itertools.islice(source, num_samples)
        batches = Prefetcher(
            batched(source, batch_size, self.model_cfg.max_gt_boxes)
        )
        if progress:
            from tqdm import tqdm

            total_samples = num_samples or getattr(dataset, "num_samples", None)
            bar = tqdm(total=total_samples)
        # Detection fetches are PIPELINED: each batch's predict is dispatched
        # and its D2H copy started immediately, but the host only blocks on a
        # batch once `depth` newer ones are in flight — so the per-fetch
        # backend round trip (33 ms on a good day, ~800 ms under tunnel
        # load) overlaps the following batches' device time instead of
        # serializing the whole eval on wire latency.
        from collections import deque

        depth = int(os.environ.get("FRCNN_EVAL_INFLIGHT", "8"))
        inflight: deque = deque()

        def drain_one():
            nonlocal seen
            det, hb_samples = inflight.popleft()
            per_image = postprocess.detections_to_dicts(det)
            # hb_samples holds only real samples; zero-weight padding rows
            # at the tail of a residue batch are dropped here.
            for sample, scored in zip(hb_samples, per_image):
                if num_samples is not None and seen >= num_samples:
                    break
                calc.add_image_results(scored, sample.gt_boxes)
                seen += 1
                if progress:
                    bar.update(1)

        try:
            for hb in batches:
                if num_samples is not None and seen + sum(
                    len(s) for _, s in inflight
                ) >= num_samples:
                    break
                predict = self.predict_fn_for(hb.canvas_hw)
                images = jnp.asarray(hb.images)
                image_hw = jnp.asarray(hb.image_hw)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    images = jax.device_put(
                        images, NamedSharding(self.mesh, P("dp", None, None, None))
                    )
                    image_hw = jax.device_put(
                        image_hw, NamedSharding(self.mesh, P("dp", None))
                    )
                det = predict(
                    self.params,
                    images,
                    image_hw,
                    score_threshold=score_threshold,
                )
                for leaf in det:
                    try:
                        leaf.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        break
                inflight.append((det, hb.samples))
                if len(inflight) >= depth:
                    drain_one()
            while inflight:
                drain_one()
        finally:
            batches.close()
        if progress:
            bar.close()
        if print_average_precisions:
            calc.print_average_precisions(
                getattr(dataset, "class_index_to_name", {})
            )
        mean_ap = 100.0 * calc.compute_mean_average_precision()
        print("Mean Average Precision = %1.2f%%" % mean_ap)
        if plot:
            calc.plot_average_precisions(
                getattr(dataset, "class_index_to_name", {})
            )
        return mean_ap

    def predict_image(
        self, sample, score_threshold: float = 0.7
    ) -> Dict[int, np.ndarray]:
        """Single-image predict -> reference-style per-class dict."""
        from fasterrcnn_tpu.config import select_canvas
        from fasterrcnn_tpu.data.pipeline import make_host_batch

        hb = make_host_batch(
            [sample], select_canvas(*sample.image_hw), self.model_cfg.max_gt_boxes
        )
        predict = self.predict_fn_for(hb.canvas_hw)
        det = predict(
            self.params,
            jnp.asarray(hb.images),
            jnp.asarray(hb.image_hw),
            score_threshold=score_threshold,
        )
        return postprocess.detections_to_dicts(det)[0]
