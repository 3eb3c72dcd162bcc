"""Profiling and memory diagnostics (TPU-native replacement for the
reference's line-level CUDA memory profiler, profile.py:116-305).

The reference's tracer existed to find per-line CUDA allocation leaks
(README.md:274-282) — a failure class that donated-buffer jit programs make
structurally impossible. What remains useful on TPU:

  * `trace(logdir)` — jax.profiler trace context (view in xprof/tensorboard),
    wired to the CLI as --profile-dir (the analog of --profile-cuda-memory).
  * `device_memory_summary()` — live buffer statistics per device, the analog
    of the reference's live-tensor dumps.
  * `log_compiled_memory(fn_jitted)` — XLA-reported peak memory of a compiled
    program (the whole train step's footprint at a glance).
  * `nan_guard()` — enables jax_debug_nans, the reference's debug-tooling
    counterpart (SURVEY.md section 5 "race detection / sanitizers").
"""

from __future__ import annotations

import contextlib
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_summary(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Live-array byte counts by device (host-visible view)."""
    stats = {}
    devices = [device] if device is not None else jax.local_devices()
    for d in devices:
        try:
            mem = d.memory_stats()
        except Exception:
            mem = None
        if mem:
            stats[str(d)] = {
                "bytes_in_use_mb": mem.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_in_use_mb": mem.get("peak_bytes_in_use", 0) / 2**20,
                "bytes_limit_mb": mem.get("bytes_limit", 0) / 2**20,
            }
    return stats


def compiled_memory_analysis(lowered_compiled) -> Dict[str, float]:
    """XLA memory analysis of a compiled function (pass fn.lower(...).compile())."""
    try:
        analysis = lowered_compiled.memory_analysis()
        return {
            "temp_mb": analysis.temp_size_in_bytes / 2**20,
            "argument_mb": analysis.argument_size_in_bytes / 2**20,
            "output_mb": analysis.output_size_in_bytes / 2**20,
            "generated_code_mb": analysis.generated_code_size_in_bytes / 2**20,
        }
    except Exception:
        return {}


@contextlib.contextmanager
def nan_guard():
    """Raise on NaN production inside jit (debug runs only; disables some
    fusion)."""
    # config.read() is forbidden for contextmanager-backed flags; the public
    # accessor is the attribute on jax.config.
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)
