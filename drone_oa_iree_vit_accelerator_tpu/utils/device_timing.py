"""True device-time measurement via jax.profiler traces.

Host-observed latency through the axon relay is untrustworthy for
benchmarking: ``block_until_ready`` acks before the device finishes
(measured: chained 4096^3 bf16 matmuls "completing" at an implied
769 TFLOP/s on a 197 TFLOP/s chip), and device->host syncs are
pathologically slow. The profiler's device lane, however, records real
on-chip execution spans — the same source of truth as TensorBoard's
TPU profile. This module runs a workload under ``jax.profiler.trace``
and aggregates the device-side durations of the top-level XLA program
executions ("jit_*" events on the TPU process lane).

This is the framework's analog of the reference's compile/scheduling
statistics discipline (reference scripts/compilation_info.txt,
--iree-scheduling-dump-statistics; SURVEY.md section 5 tracing): measured
numbers must come from the runtime's own observability, not wall-clock
guesswork.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from collections import Counter
from dataclasses import dataclass, field

import jax


@dataclass
class DeviceTiming:
    """Aggregated device-lane timing of one traced run."""

    total_ms: float  # sum of top-level program execution spans
    n_executions: int  # number of top-level program events
    per_program_ms: dict = field(default_factory=dict)  # name -> summed ms
    per_program_count: dict = field(default_factory=dict)

    @property
    def per_call_ms(self) -> float:
        return self.total_ms / max(self.n_executions, 1)


def _parse_trace(trace_dir: str) -> DeviceTiming:
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
        )
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    dur_us: Counter = Counter()
    cnt: Counter = Counter()
    for e in ev:
        if (
            e.get("ph") == "X"
            and e.get("pid") in device_pids
            and str(e.get("name", "")).startswith("jit_")
        ):
            dur_us[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total_ms = sum(dur_us.values()) / 1e3
    return DeviceTiming(
        total_ms=total_ms,
        n_executions=sum(cnt.values()),
        per_program_ms={k: v / 1e3 for k, v in dur_us.items()},
        per_program_count=dict(cnt),
    )


def measure_device_time(run_fn, trace_dir: str | None = None) -> DeviceTiming:
    """Trace ``run_fn()`` (which should launch + block on jitted work) and
    return the aggregated device-lane timing of every jit_* execution."""
    tmp = trace_dir or tempfile.mkdtemp(prefix="doa_trace_")
    with jax.profiler.trace(tmp):
        run_fn()
    return _parse_trace(tmp)


def device_time_per_call(
    step_fn, args_list, warmup_args=None, settle_s: float = 1.0
) -> DeviceTiming:
    """Measure the true device time of ``step_fn(*args)`` per call.

    ``args_list``: a list of argument tuples, one per timed call — callers
    must supply DISTINCT inputs per call (the relay memoizes identical
    re-invocations). ``warmup_args`` (or the first entry) is run once
    outside the trace to absorb compilation.

    ``settle_s``: kept inside the trace after block_until_ready returns —
    on relays whose ready-ack races actual device completion, this keeps
    the trace open until the tail executions land. The caller should check
    ``n_executions`` against the expected call count and re-measure with a
    larger settle if short.
    """
    import time

    wa = warmup_args if warmup_args is not None else args_list[0]
    jax.block_until_ready(step_fn(*wa))

    def run():
        out = None
        for args in args_list:
            out = step_fn(*args)
        jax.block_until_ready(out)
        time.sleep(settle_s)

    return measure_device_time(run)
