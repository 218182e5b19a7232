"""Measured serving story for EVERY model-zoo config (docs/zoo_bench.json).

bench.py (the driver benchmark) covers the flagship + the ITA base
shape; this script completes the zoo — all four reference architecture
variants (reference models/ITA*/model.py; SURVEY.md section 2.1) get a
measured batch-1 latency (f32 + pallas serving paths) and a batched
throughput row (the measured-best turbo routing via
make_batched_serving_step's policy), all true device times from
jax.profiler traces.

Run on the TPU: python scripts/zoo_bench.py
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from drone_oa_iree_vit_accelerator_tpu.core import MODEL_ZOO  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu import quant as QZ  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.quant.batched import (  # noqa: E402
    make_tail,
    turbo_forward,
)
from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (  # noqa: E402
    device_time_per_call,
)


def bench_config(name: str, cfg) -> dict:
    key = jax.random.PRNGKey(0)
    params = M.init_params(cfg, key)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = QZ.calibrate_ptq(cfg, params, frames_cal)
    tail = make_tail(cfg, params)
    params = M.freeze_for_inference(cfg, params)
    f32 = jnp.float32
    out = {"dims": f"L={cfg.num_layers} E={cfg.E} S={cfg.S} P={cfg.P} "
                   f"F={cfg.F} H={cfg.H} fusion={cfg.fusion.name}"}

    def b1_step(kind):
        if kind == "pallas":
            fwd = lambda p, ip, f, v, q, s: QZ.pallas_forward(
                cfg, p, ip, f, v, q, s
            )
        else:
            fwd = lambda p, ip, f, v, q, s: M.forward(
                cfg, p, f, v, q, s, encoder_layout="nhwc"
            )

        @jax.jit
        def step(p, ip, frame_u8, vel, quat, s):
            return fwd(p, ip, frame_u8.astype(f32) / 255.0, vel, quat, s)

        return step

    for kind, ncalls in (("f32", 40), ("pallas", 40)):
        step = b1_step(kind)

        def args():
            vel = jnp.ones((1, 1), f32)
            quat = jnp.asarray([[1.0, 0, 0, 0]], f32)
            frames = [
                jax.random.randint(jax.random.PRNGKey(10 + i), (1, 1, 60, 90),
                                   0, 256, jnp.uint8)
                for i in range(ncalls + 1)
            ]
            jax.block_until_ready(frames)
            st = M.zero_state(cfg, 1)
            return (
                [(params, int_params, frames[i + 1], vel, quat, st)
                 for i in range(ncalls)],
            ), {"warmup_args": (params, int_params, frames[0], vel, quat, st)}

        a, kw = args()
        t = device_time_per_call(step, a[0], **kw)
        if t.n_executions < ncalls:
            a, kw = args()
            t = device_time_per_call(step, a[0], settle_s=3.0, **kw)
        us = t.per_call_ms * 1e3
        out[f"{kind}_b1"] = {"device_us": round(us, 2),
                             "fps": round(1e6 / us, 0)}

    # Whole-model megakernel serving step (the deployed batch-1 path):
    # flagship -> model_kernel, FLATTEN variants -> flatten_kernel. The
    # serving step includes the tokenizer + in-kernel postprocess, so
    # this row is the true camera->command device time.
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        _make_kernel_params,
    )
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_serving_step,
    )

    ncalls = 40
    kp = _make_kernel_params(cfg, params, int_params)
    mstep = make_serving_step(cfg, "mega")

    def margs():
        vel = jnp.float32(4.0)
        quat = jnp.asarray([1.0, 0, 0, 0], f32)
        frames = [
            jax.random.randint(jax.random.PRNGKey(30 + i), (60, 90),
                               0, 256, jnp.uint8)
            for i in range(ncalls + 1)
        ]
        jax.block_until_ready(frames)
        px = jnp.float32(5.0)
        # Fresh state per call: the step donates its state argument.
        return (
            [(kp, None, frames[i + 1], vel, px, quat, M.zero_state(cfg, 1))
             for i in range(ncalls)],
            (kp, None, frames[0], vel, px, quat, M.zero_state(cfg, 1)),
        )

    a, warm = margs()
    t = device_time_per_call(mstep, a, warmup_args=warm)
    if t.n_executions < ncalls:
        a, warm = margs()
        t = device_time_per_call(mstep, a, warmup_args=warm, settle_s=3.0)
    us = t.per_call_ms * 1e3
    out["mega_b1"] = {"device_us": round(us, 2), "fps": round(1e6 / us, 0)}

    # Batched throughput at b1024 with the measured-best routing
    # (turbo/pallas for H==1 configs, turbo_int8 golden encoder for H>1
    # — the same policy as make_batched_serving_step).
    encoder = "pallas_T" if cfg.H == 1 else "int8"
    ttail = make_tail(cfg, params, e_major=True) if cfg.H == 1 else tail
    b, ncalls = 1024, 10

    @jax.jit
    def tstep(p, ip, frame_u8, vel, quat, s):
        return turbo_forward(
            cfg, p, ip, ttail, frame_u8.astype(f32) / 255.0, vel, quat, s,
            encoder=encoder,
        )

    def targs():
        vel = jnp.ones((b, 1), f32)
        quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], f32), (b, 1))
        frames = [
            jax.random.randint(jax.random.PRNGKey(50 + i), (b, 1, 60, 90),
                               0, 256, jnp.uint8)
            for i in range(ncalls + 1)
        ]
        jax.block_until_ready(frames)
        st = M.zero_state(cfg, b)
        return (
            [(params, int_params, frames[i + 1], vel, quat, st)
             for i in range(ncalls)],
            (params, int_params, frames[0], vel, quat, st),
        )

    a, warm = targs()
    t = device_time_per_call(tstep, a, warmup_args=warm)
    if t.n_executions < ncalls:
        a, warm = targs()
        t = device_time_per_call(tstep, a, warmup_args=warm, settle_s=3.0)
    ms = t.per_call_ms
    out["turbo_b1024"] = {
        "encoder": encoder,
        "device_ms": round(ms, 4),
        "fps": round(b / ms * 1e3, 0),
    }
    return out


def bench_vitfly() -> dict:
    """Serving rows for the vitfly (upstream ITALSTM) family — the
    reference's alt export path (scripts/export_model.py:132-158) now has
    int8 + measured serving numbers like the ITA family (VERDICT r3
    item 3)."""
    from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        _calibrate_vitfly,
    )
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_vitfly_serving_step,
    )

    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.vitfly_model_kernel import (
        make_vitfly_kernel_params,
    )

    vcfg = VF.VITFLY_LSTM
    key = jax.random.PRNGKey(0)
    params = VF.init_params(vcfg, key)
    vint = _calibrate_vitfly(params)
    kp = make_vitfly_kernel_params(vcfg, params, vint)
    out = {
        "dims": "2-stage ITALSTM (spatial-reduction attn, H=2)",
        "note": (
            "int8/pallas slower than f32 at b1: the quantized region's "
            "cost is per-launch overhead, not arithmetic — the fused "
            "per-block kernel (pallas) matches the XLA int8 path within "
            "noise because 4 kernel launches x ~10 us fixed cost "
            "dominate. The whole-model megakernel (mega_b1, r5) measured "
            "NEGATIVE for this geometry: its transposed token planes "
            "(32x345, 64x96) run the MXU at quarter occupancy and one "
            "Mosaic program serializes ~60 such passes, where XLA's own "
            "schedule overlaps better (precision pin moved nothing — "
            "pass-bound). Per-block pallas is the vitfly quantized "
            "champion; see README Known levers."
        ),
    }
    ncalls = 40
    for kind in ("f32", "int8", "pallas", "mega"):
        step = make_vitfly_serving_step(vcfg, kind)
        bp = kp if kind == "mega" else params
        bip = None if kind == "mega" else vint

        def vargs():
            vel = jnp.float32(4.0)
            quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
            frames = [
                jax.random.randint(jax.random.PRNGKey(70 + i), (60, 90),
                                   0, 256, jnp.uint8)
                for i in range(ncalls + 1)
            ]
            jax.block_until_ready(frames)
            px = jnp.float32(5.0)
            return (
                [(bp, bip, frames[i + 1], vel, px, quat,
                  M.zero_state(vcfg, 1)) for i in range(ncalls)],
                (bp, bip, frames[0], vel, px, quat,
                 M.zero_state(vcfg, 1)),
            )

        a, warm = vargs()
        t = device_time_per_call(step, a, warmup_args=warm)
        if t.n_executions < ncalls:
            a, warm = vargs()
            t = device_time_per_call(step, a, warmup_args=warm, settle_s=3.0)
        us = t.per_call_ms * 1e3
        out[f"{kind}_b1"] = {"device_us": round(us, 2),
                             "fps": round(1e6 / us, 0)}
    return out


def main() -> None:
    report = {"device": jax.devices()[0].device_kind,
              "timing_source": "jax.profiler device traces"}
    for name, cfg in MODEL_ZOO.items():
        print(f"benching {name} ...", flush=True)
        report[name] = bench_config(name, cfg)
    print("benching vitfly_lstm ...", flush=True)
    report["vitfly_lstm"] = bench_vitfly()
    out_path = pathlib.Path(__file__).resolve().parents[1] / "docs" / \
        "zoo_bench.json"
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
