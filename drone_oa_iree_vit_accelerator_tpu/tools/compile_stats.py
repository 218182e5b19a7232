"""Compilation statistics reporter — the compilation_info.txt analog.

The reference records IREE scheduling statistics per compile (dispatch
count, executable count, constants size; 4 snapshots checked in, e.g.
reference scripts/compilation_info.txt). The XLA equivalents come from
the lowered/compiled artifacts: HLO op histogram, fusion count (the
"dispatch" analog), constant bytes, and the compiler's own memory/cost
analyses.

    python -m drone_oa_iree_vit_accelerator_tpu.tools.compile_stats
"""

from __future__ import annotations

import collections
import json

import jax
import jax.numpy as jnp


def compile_stats(jitted, *args) -> dict:
    """Lower + compile a jitted function; return a stats dict."""
    lowered = jitted.lower(*args)
    compiled = lowered.compile()

    import re

    hlo = lowered.as_text()  # StableHLO MLIR
    ops = collections.Counter(
        m.group(1)
        for m in re.finditer(r"=\s+\"?((?:stablehlo|chlo|tpu|vhlo)\.[\w.]+)", hlo)
    )
    ops.pop("stablehlo.constant", None)

    stats: dict = {
        "hlo_ops_total": sum(ops.values()),
        "hlo_op_histogram": dict(ops.most_common(20)),
    }
    try:
        mem = compiled.memory_analysis()
        if mem is not None:
            stats["memory"] = {
                "argument_bytes": int(getattr(mem, "argument_size_in_bytes", 0)),
                "output_bytes": int(getattr(mem, "output_size_in_bytes", 0)),
                "temp_bytes": int(getattr(mem, "temp_size_in_bytes", 0)),
                "generated_code_bytes": int(
                    getattr(mem, "generated_code_size_in_bytes", 0)
                ),
            }
    except Exception:
        pass
    try:
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            stats["cost"] = {
                k: float(v)
                for k, v in c.items()
                if k in ("flops", "bytes accessed", "transcendentals")
            }
    except Exception:
        pass
    # "Dispatch" analog: count top-level fusion computations in the
    # optimized HLO (each fusion is one device kernel launch region).
    try:
        opt = compiled.as_text()
        stats["fusions"] = opt.count("fusion(")
        stats["custom_calls"] = opt.count("custom-call(")
    except Exception:
        pass
    return stats


def main() -> None:
    from ..core.config import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
    from ..models import vit_lstm as M
    from ..pipeline import wire
    from ..pipeline.serve import _calibrate_random, make_serving_step

    params = M.init_params(CFG, jax.random.PRNGKey(0))
    int_params = _calibrate_random(CFG, params)
    report = {}
    for path in ("mega", "pallas", "int8", "f32"):
        step = make_serving_step(CFG, path)
        p_arg = params
        if path == "mega":
            from ..ops.pallas.model_kernel import make_flagship_kernel_params

            p_arg = make_flagship_kernel_params(CFG, params, int_params)
        args = (
            p_arg, int_params,
            jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8),
            jnp.float32(1.0), jnp.float32(5.0),
            jnp.zeros((4,), jnp.float32),
            M.zero_state(CFG, 1),
        )
        report[path] = compile_stats(step, *args)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
