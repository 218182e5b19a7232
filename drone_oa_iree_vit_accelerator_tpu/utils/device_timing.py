"""True device-time measurement via jax.profiler traces.

Host-observed latency through the axon relay is untrustworthy for
benchmarking: ``block_until_ready`` acks before the device finishes
(measured: chained 4096^3 bf16 matmuls "completing" at an implied
769 TFLOP/s on a 197 TFLOP/s chip), and device->host syncs are
pathologically slow. The profiler's device lane, however, records real
on-chip execution spans — the same source of truth as TensorBoard's
TPU profile. This module runs a workload under ``jax.profiler.trace``
and aggregates:

- the "XLA Modules" lane: one span per top-level program execution
  ("jit_*") — per-call totals AND the per-execution distribution
  (p50/p90/p99 latency percentiles);
- the "XLA Ops" lane: per-HLO-op device spans with hlo_category,
  model_flops and bytes_accessed — the per-op breakdown that says where
  a program's time actually goes (VERDICT r2 items 1-3).

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
from collections import Counter, defaultdict
from dataclasses import dataclass, field

import jax


@dataclass
class OpStat:
    """Aggregated device time of one HLO op across all executions."""

    ms: float = 0.0
    count: int = 0
    category: str = ""
    flops: float = 0.0          # model_flops summed over executions
    bytes_accessed: float = 0.0
    long_name: str = ""         # HLO text snippet (shapes, operands)


@dataclass
class DeviceTiming:
    """Aggregated device-lane timing of one traced run."""

    total_ms: float  # sum of top-level program execution spans
    n_executions: int  # number of top-level program events
    per_program_ms: dict = field(default_factory=dict)  # name -> summed ms
    per_program_count: dict = field(default_factory=dict)
    span_ms: list = field(default_factory=list)  # individual execution spans
    per_op: dict = field(default_factory=dict)  # op name -> OpStat

    @property
    def per_call_ms(self) -> float:
        return self.total_ms / max(self.n_executions, 1)

    def percentile_ms(self, q: float) -> float:
        """q-th percentile (0..100) of individual execution spans."""
        if not self.span_ms:
            return float("nan")
        s = sorted(self.span_ms)
        idx = min(int(round(q / 100.0 * (len(s) - 1))), len(s) - 1)
        return s[idx]

    def percentiles(self) -> dict:
        return {
            "p50_ms": round(self.percentile_ms(50), 5),
            "p90_ms": round(self.percentile_ms(90), 5),
            "p99_ms": round(self.percentile_ms(99), 5),
        }

    def op_breakdown(self, top: int = 12, by_category: bool = False) -> list:
        """Top ops (or categories) by summed device time, with per-op MFU
        inputs (flops, bytes). Returns a list of dicts sorted by ms."""
        if by_category:
            agg: dict[str, OpStat] = defaultdict(OpStat)
            for st in self.per_op.values():
                a = agg[st.category or "uncategorized"]
                a.ms += st.ms
                a.count += st.count
                a.flops += st.flops
                a.bytes_accessed += st.bytes_accessed
            items = agg.items()
        else:
            items = self.per_op.items()
        rows = sorted(items, key=lambda kv: -kv[1].ms)[:top]
        return [
            {
                "op": k,
                "ms": round(st.ms, 4),
                "count": st.count,
                "category": st.category if not by_category else k,
                "gflops": round(st.flops / 1e9, 3),
                "gbytes": round(st.bytes_accessed / 1e9, 4),
            }
            for k, st in rows
        ]


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
    device_pids = set()
    lane_name: dict[tuple, str] = {}
    for e in ev:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "TPU" in str(
            e.get("args", {}).get("name", "")
        ):
            device_pids.add(e["pid"])
        if e.get("name") == "thread_name":
            lane_name[(e["pid"], e.get("tid"))] = str(
                e.get("args", {}).get("name", "")
            )

    dur_us: Counter = Counter()
    cnt: Counter = Counter()
    spans_us: list[float] = []
    per_op: dict[str, OpStat] = {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = lane_name.get((e["pid"], e.get("tid")), "")
        name = str(e.get("name", ""))
        dur = e.get("dur", 0)
        if name.startswith("jit_") and lane != "XLA Ops":
            # Top-level program execution (the "XLA Modules" lane).
            dur_us[name] += dur
            cnt[name] += 1
            spans_us.append(dur)
        elif lane == "XLA Ops":
            st = per_op.setdefault(name, OpStat())
            st.ms += dur / 1e3
            st.count += 1
            args = e.get("args", {})
            if not st.category:
                st.category = str(args.get("hlo_category", ""))
            if not st.long_name:
                st.long_name = str(args.get("long_name", ""))[:400]
            try:
                st.flops += float(args.get("model_flops", 0) or 0)
            except (TypeError, ValueError):
                pass
            try:
                st.bytes_accessed += float(
                    args.get("bytes_accessed", 0) or 0
                )
            except (TypeError, ValueError):
                pass
    total_ms = sum(dur_us.values()) / 1e3
    return DeviceTiming(
        total_ms=total_ms,
        n_executions=sum(cnt.values()),
        per_program_ms={k: v / 1e3 for k, v in dur_us.items()},
        per_program_count=dict(cnt),
        span_ms=[d / 1e3 for d in spans_us],
        per_op=per_op,
    )


def measure_device_time(run_fn, trace_dir: str | None = None) -> DeviceTiming:
    """Trace ``run_fn()`` (which should launch + block on jitted work) and
    return the aggregated device-lane timing of every jit_* execution.

    A self-created tempdir is deleted after parsing (benchmark sweeps
    make dozens of traces; leaking them fills /tmp). Pass ``trace_dir``
    to keep the trace (e.g. for TensorBoard)."""
    tmp = trace_dir or tempfile.mkdtemp(prefix="doa_trace_")
    try:
        with jax.profiler.trace(tmp):
            run_fn()
        return _parse_trace(tmp)
    finally:
        if trace_dir is None:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)


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
