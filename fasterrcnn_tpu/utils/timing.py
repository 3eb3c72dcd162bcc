"""Honest device timing on this backend.

`jax.block_until_ready` returns immediately without blocking on the axon
tunnel, so naive wall-clock timing measures only dispatch. The reliable
recipe: run a dispatch loop terminated by a host-side scalar fetch (which
genuinely blocks until the in-order device queue drains), at two iteration
counts, and report the SLOPE — fixed per-call overheads (~33 ms
dispatch+fetch round-trip) cancel. Validated against a chained-matmul probe
reproducing the chip's ~210 TFLOP/s bf16 peak.

Used by bench.py and scripts/profile_{inference,train}.py.
"""

from __future__ import annotations

import time
from typing import Callable


def slope_ms(
    dispatch: Callable[[], None],
    fetch: Callable[[], None],
    iters_lo: int,
    iters_hi: int,
) -> float:
    """Milliseconds per iteration of `dispatch`, overhead-cancelled.

    Args:
      dispatch: enqueue one iteration of device work (must NOT fetch).
      fetch: block on a host-side value of the latest result.
      iters_lo / iters_hi: the two loop lengths; slope is taken between them.

    The caller must have compiled/warmed the computation already (a cold
    call would bill compilation to the hi-count leg).
    """

    def run(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            dispatch()
        fetch()
        return time.perf_counter() - t0

    run(1)  # settle caches / queue state
    t_lo = run(iters_lo)
    t_hi = run(iters_hi)
    return (t_hi - t_lo) / (iters_hi - iters_lo) * 1e3
