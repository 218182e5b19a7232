"""Per-op device-trace breakdown of the batched serving paths.

Answers VERDICT r2's "where do the other 85% go?": traces the b=1024
serving programs on the real chip and dumps the XLA-op-level device-time
breakdown (utils/device_timing.py op lanes) with per-op flops/bytes so
the MFU gap decomposes into named ops. Output: docs/op_breakdown.json
plus stdout tables.

    python scripts/profile_b1024.py [--paths int8_bf16,pallas,f32] [--batch 1024]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", default="int8_bf16,pallas,f32")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--ncalls", type=int, default=12)
    ap.add_argument("--out", default="docs/op_breakdown.json")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from drone_oa_iree_vit_accelerator_tpu.core import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import params_io
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu import quant as QZ
    from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (
        device_time_per_call,
    )

    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    ckpt_dir = pathlib.Path(__file__).resolve().parents[1] / "checkpoints"
    if (ckpt_dir / "model_float.npz").exists():
        params = params_io.load_params(str(ckpt_dir / "model_float.npz"), params)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = QZ.calibrate_ptq(CFG, params, frames_cal)
    if (ckpt_dir / "model_int8.npz").exists():
        int_params = params_io.load_params(
            str(ckpt_dir / "model_int8.npz"), int_params
        )
    params = M.freeze_for_inference(CFG, params)

    def make_step(kind):
        if kind == "pallas":
            fwd = lambda p, ip, f, v, q, s: QZ.pallas_forward(CFG, p, ip, f, v, q, s)
        elif kind == "pallas_bf16":
            fwd = lambda p, ip, f, v, q, s: QZ.pallas_forward(
                CFG, p, ip, f, v, q, s, glue_dtype=jnp.bfloat16
            )
        elif kind == "int8":
            fwd = lambda p, ip, f, v, q, s: QZ.int8_forward(
                CFG, p, ip, f, v, q, s, encoder_layout="nhwc"
            )
        elif kind == "int8_bf16":
            fwd = lambda p, ip, f, v, q, s: QZ.int8_forward(
                CFG, p, ip, f, v, q, s, glue_dtype=jnp.bfloat16,
                encoder_layout="nhwc",
            )
        elif kind == "turbo":
            from drone_oa_iree_vit_accelerator_tpu.quant.batched import (
                make_tail,
                turbo_forward,
            )

            tail = make_tail(CFG, params, e_major=True)

            def fwd(p, ip, f, v, q, s):
                return turbo_forward(
                    CFG, p, ip, tail, f, v, q, s, encoder="pallas_T", max_nb=8
                )
        else:
            fwd = lambda p, ip, f, v, q, s: M.forward(
                CFG, p, f, v, q, s, encoder_layout="nhwc"
            )

        @jax.jit
        def step(p, ip, frame_u8, vel, quat, state):
            frame = frame_u8.astype(jnp.float32) / 255.0
            return fwd(p, ip, frame, vel, quat, state)

        return step

    batch, ncalls = args.batch, args.ncalls
    vel = jnp.ones((batch, 1), jnp.float32)
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (batch, 1))
    state = M.zero_state(CFG, batch)
    frames = [
        jax.random.randint(
            jax.random.PRNGKey(i), (batch, 1, 60, 90), 0, 256, jnp.uint8
        )
        for i in range(ncalls + 1)
    ]
    jax.block_until_ready(frames)

    report = {"batch": batch, "ncalls": ncalls, "paths": {}}
    for kind in args.paths.split(","):
        step = make_step(kind)
        argsl = [
            (params, int_params, frames[i + 1], vel, quat, state)
            for i in range(ncalls)
        ]
        warm = (params, int_params, frames[0], vel, quat, state)
        t = device_time_per_call(step, argsl, warmup_args=warm)
        if t.n_executions < ncalls:
            t = device_time_per_call(step, argsl, warmup_args=warm, settle_s=3.0)
        ops = t.op_breakdown(top=args.top)
        cats = t.op_breakdown(top=12, by_category=True)
        # Per-call normalization: summed ms / n executions.
        n = max(t.n_executions, 1)
        report["paths"][kind] = {
            "device_ms_per_call": round(t.per_call_ms, 4),
            "percentiles": t.percentiles(),
            "n_timed": t.n_executions,
            "ops_per_call_us": [
                {**r, "us_per_call": round(r["ms"] / n * 1e3, 2)} for r in ops
            ],
            "categories_per_call_us": [
                {**r, "us_per_call": round(r["ms"] / n * 1e3, 2)} for r in cats
            ],
        }
        print(f"\n=== {kind}  {t.per_call_ms:.4f} ms/call  "
              f"{t.percentiles()} ===")
        for r in report["paths"][kind]["categories_per_call_us"]:
            print(f"  {r['us_per_call']:9.2f} us/call  {r['op'][:60]}")
        for r in report["paths"][kind]["ops_per_call_us"][:15]:
            print(f"    {r['us_per_call']:8.2f} us  [{r['category'][:18]:18}] "
                  f"{r['op'][:58]}")

    out = pathlib.Path(__file__).resolve().parents[1] / args.out
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
