#!/usr/bin/env python
"""Hardware A/B of the Pallas implicit-GEMM 3x3 conv vs XLA's conv emitter.

Targets the roofline-binding VGG layers (README "Benchmarks": backbone
convs at ~61% MFU are the ceiling): block4 (76x100x512) and block5
(38x50x512) at the inference batch, plus block3 (152x200x256) for context.
Prints one JSON line per (shape, config) with ms/op, TFLOP/s and MFU.

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

    from fasterrcnn_tpu.ops.pallas import conv_pallas

    bsz = int(os.environ.get("CONV_BATCH", "32"))
    trials = int(os.environ.get("CONV_TRIALS", "3"))
    n_lo = int(os.environ.get("CONV_N_LO", "10"))
    n_hi = int(os.environ.get("CONV_N_HI", "50"))
    shapes = [
        ("block5", bsz, 38, 50, 512, 512, [(19, 256), (19, 128), (2, 256)]),
        ("block4", bsz, 76, 100, 512, 512, [(19, 256), (19, 128), (4, 256), (4, 128)]),
        ("block3", bsz, 152, 200, 256, 256, [(19, 256), (8, 256)]),
        # Early low-channel layers (XLA-only rows): C=64/128 underfill the
        # MXU's 128 lanes regardless of implementation — these bound the
        # backbone's AGGREGATE MFU from below. Smaller batches keep the
        # activation buffers reasonable (block1 at bs=32 would be 2 GB).
        ("block2", min(bsz, 16), 304, 400, 128, 128, []),
        ("block1", min(bsz, 8), 608, 800, 64, 64, []),
    ]
    rng = np.random.default_rng(0)

    for name, b, h, w, c, cout, configs in shapes:
        key = jax.random.key(0)
        x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        wk = jnp.asarray(rng.normal(0, 0.02, (3, 3, c, cout)), jnp.bfloat16)
        bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.bfloat16)
        flops = 2.0 * b * h * w * 9 * c * cout

        def measure(conv_fn):
            def chained(n):
                @jax.jit
                def run(x0):
                    return jax.lax.fori_loop(
                        0, n, lambda i, v: conv_fn(v), x0
                    )
                return run

            run_lo, run_hi = chained(n_lo), chained(n_hi)

            def once(run):
                t0 = time.perf_counter()
                y = run(x)
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

        for tile, cs in configs:
            if h % tile:
                continue
            try:
                ms = measure(functools.partial(
                    conv_pallas.conv3x3_pallas,
                    w=wk, b=bias, relu=True, tile=tile, cout_split=cs,
                ))
                rec = {
                    "layer": name, "impl": f"pallas_t{tile}_cs{cs}",
                    "ms": round(ms, 3),
                    "tflops": round(flops / (ms / 1e3) / 1e12, 1),
                    "mfu": round(flops / (ms / 1e3) / PEAK_BF16_FLOPS, 3),
                }
            except Exception as e:
                rec = {"layer": name, "impl": f"pallas_t{tile}_cs{cs}",
                       "error": f"{type(e).__name__}: {e}"[:160]}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
