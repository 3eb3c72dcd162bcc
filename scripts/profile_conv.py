#!/usr/bin/env python
"""Hardware A/B of 3x3-conv implementations vs XLA's conv emitter.

Contenders per VGG layer shape: XLA direct (baseline), the two Pallas
prototypes (ops/pallas/conv_pallas.py — both measured negative results),
the standalone width-packed rewrite (ops/conv_s2d.py, "s2dw"), and the
packed-CHAIN leg shapes ("p_*" rows) that block1's production path runs
(models/vgg16.py). Prints one JSON line per (shape, config) with ms/op,
TFLOP/s and MFU.

Methodology: ms-scale ops cannot be timed with a dispatch-per-op loop on
this backend (33-800 ms RPC swings swamp the slope; round-3's naive
attempt produced negative slopes). Instead each measurement jits ONE
program that chains the conv N times through `lax.fori_loop` (cout == cin
for all target layers, so the shape is a fixed point), times the single
dispatch+fetch at two N values, and reports the slope — 2 RPCs per
measurement total, median of CONV_TRIALS.

Usage (real chip, long compile):  timeout 3000 python scripts/profile_conv.py
Sweep knobs: CONV_BATCH (default 32), CONV_TRIALS (default 3),
CONV_N_LO/CONV_N_HI (default 10/50).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_BF16_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fasterrcnn_tpu.ops import conv_s2d
    from fasterrcnn_tpu.ops.pallas import conv_pallas

    bsz = int(os.environ.get("CONV_BATCH", "32"))
    trials = int(os.environ.get("CONV_TRIALS", "3"))
    n_lo = int(os.environ.get("CONV_N_LO", "10"))
    n_hi = int(os.environ.get("CONV_N_HI", "50"))
    shapes = [
        ("block5", bsz, 38, 50, 512, 512, [(19, 256), (19, 128), (2, 256)]),
        ("block4", bsz, 76, 100, 512, 512, [(19, 256), (19, 128), (4, 256), (4, 128)]),
        ("block3", bsz, 152, 200, 256, 256, [(19, 256), (8, 256)]),
        # Early low-channel layers: a per-tap K=C matmul underfills the
        # MXU's contraction depth AND Cout<128 underfills its output
        # lanes, so XLA's per-layer MFU collapses (21% on block1 = 84% of
        # the 25% structural cap) and these dominate the backbone's
        # aggregate. Two contenders: the Pallas im2col kernel (one K=9C
        # matmul; "im2col_tN") and the width-packed layout rewrite
        # (ops/conv_s2d.py, "s2dw": (B,H,W/2,2C) + (3,3,2C,2Cout) kernel
        # — 2x padded FLOPs, MXU full on both axes, pure XLA). s2dw MFU is
        # reported against the DIRECT conv's useful FLOPs so rows compare
        # 1:1. Smaller batches keep activation buffers reasonable (block1
        # at bs=32 would be 2 GB).
        ("block2", min(bsz, 16), 304, 400, 128, 128,
         [("s2dw", None), ("im2col", 8)]),
        ("block1", min(bsz, 8), 608, 800, 64, 64,
         [("s2dw", None)]),
        ("conv2_1", min(bsz, 16), 304, 400, 64, 128, [("s2dw", None)]),
        ("conv1_1", min(bsz, 8), 608, 800, 3, 64, [("s2dw", None)]),
        # Packed-CHAIN legs (ops/conv_s2d.py): standalone s2dw pays a
        # pack+unpack relayout (~full HBM pass each) per conv, but a chain
        # that packs once at the image and stays packed through blocks 1-2
        # amortizes them. A packed conv is numerically a dense conv at the
        # packed shape (structural zeros don't speed XLA up), so its cost
        # is measured here as plain xla rows at those shapes. NOTE: ms is
        # the honest number; "mfu" for p_* rows is against PACKED FLOPs
        # (2x the useful work of the layer they replace).
        ("p_conv1_1", min(bsz, 8), 608, 400, 6, 128, []),
        ("p_conv1_2", min(bsz, 8), 608, 400, 128, 128, []),
        ("p_conv2_1", min(bsz, 16), 304, 200, 128, 256, []),
        ("p_conv2_2", min(bsz, 16), 304, 200, 256, 256, []),
    ]
    rng = np.random.default_rng(0)

    for name, b, h, w, c, cout, configs in shapes:
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        wk = jnp.asarray(rng.normal(0, 0.02, (3, 3, c, cout)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.bfloat16)
        flops = 2.0 * b * h * w * 9 * c * cout

        def measure(conv_fn):
            if c == cout:
                body = lambda i, v: conv_fn(v)  # shape fixed point
                x0 = x
            else:
                # cin != cout: feed the captured input each iteration with
                # a non-foldable data dependency on the previous output so
                # the chain still serializes (1e-8 defeats 0-multiply
                # constant folding; values stay ~x).
                body = lambda i, v: conv_fn(x + v[..., :c] * jnp.bfloat16(1e-8))
                x0 = jnp.zeros((b, h, w, cout), jnp.bfloat16)

            def chained(n):
                @jax.jit
                def run(v0):
                    return jax.lax.fori_loop(0, n, body, v0)
                return run

            run_lo, run_hi = chained(n_lo), chained(n_hi)

            def once(run):
                t0 = time.perf_counter()
                y = run(x0)
                float(y[0, 0, 0, 0].astype(jnp.float32))
                return time.perf_counter() - t0

            once(run_lo)
            once(run_hi)  # compile + warm both
            slopes = sorted(
                (once(run_hi) - once(run_lo)) / (n_hi - n_lo) * 1e3
                for _ in range(trials)
            )
            return slopes[trials // 2]

        ms = measure(lambda v: conv_pallas._xla_conv3x3(v, wk, bias, True))
        print(json.dumps({
            "layer": name, "impl": "xla", "ms": round(ms, 3),
            "tflops": round(flops / (ms / 1e3) / 1e12, 1),
            "mfu": round(flops / (ms / 1e3) / PEAK_BF16_FLOPS, 3),
        }), flush=True)

        for cfg_a, cfg_b in configs:
            if cfg_a == "s2dw":
                tile, label = 1, "s2dw"
                fn = functools.partial(
                    conv_s2d.conv3x3_s2dw, w=wk, b=bias, relu=True
                )
            elif cfg_a == "im2col":
                tile, label = cfg_b, f"im2col_t{cfg_b}"
                fn = functools.partial(
                    conv_pallas.conv3x3_im2col_pallas,
                    w=wk, b=bias, relu=True, tile=tile,
                )
            else:
                tile, cs = cfg_a, cfg_b
                label = f"pallas_t{tile}_cs{cs}"
                fn = functools.partial(
                    conv_pallas.conv3x3_pallas,
                    w=wk, b=bias, relu=True, tile=tile, cout_split=cs,
                )
            if h % tile:
                continue
            try:
                ms = measure(fn)
                rec = {
                    "layer": name, "impl": label,
                    "ms": round(ms, 3),
                    "tflops": round(flops / (ms / 1e3) / 1e12, 1),
                    "mfu": round(flops / (ms / 1e3) / PEAK_BF16_FLOPS, 3),
                }
            except Exception as e:
                rec = {"layer": name, "impl": label,
                       "error": f"{type(e).__name__}: {e}"[:160]}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
