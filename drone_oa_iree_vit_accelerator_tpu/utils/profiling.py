"""Profiling helpers: latency harness + jax.profiler traces.

The reference's observability is IREE compile-time statistics plus docs
pointing at IREE's profiling tools (SURVEY.md section 5). TPU-side the
equivalents are: a block_until_ready latency harness (below),
tools/compile_stats for the static picture, and jax.profiler traces for
timeline inspection (view with TensorBoard or xprof).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


def measure_latency(
    fn: Callable[..., Any],
    *args,
    iters: int = 200,
    warmup: int = 3,
    **kwargs,
) -> dict[str, float]:
    """p50/p90/p99/mean wall-clock of fn(*args) with device sync.

    No device-to-host transfers happen inside the loop (critical: a D2H
    degrades dispatch latency on some platforms — see the verify skill).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    lat: list[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return {
        "p50_ms": lat[len(lat) // 2] * 1e3,
        "p90_ms": lat[int(len(lat) * 0.9)] * 1e3,
        "p99_ms": lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1e3,
        "mean_ms": sum(lat) / len(lat) * 1e3,
        "iters": float(iters),
    }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context; open the logdir with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
