"""Benchmark: camera->command serving on one chip (flagship model).

Methodology (round 2): all performance numbers are TRUE DEVICE TIMES from
jax.profiler device traces (utils/device_timing.py) — on this host the
relay transport acks block_until_ready before the chip finishes, so
host-observed wall time is not a valid latency measurement (measured:
chained 4096^3 bf16 matmuls "completing" at an implied 769 TFLOP/s on a
197 TFLOP/s chip). Round 1's 12.5M frames/s headline was such an
artifact; the honest numbers below are ~30x smaller and carry an MFU
cross-check (VERDICT r1 items 2/8/10).

Paths, each ONE jitted program (fused preprocess + model):
- pallas      : fused Pallas int8 ITA encoder kernel inside the model
- pallas_bf16 : same + bf16 float glue (the deployment analog of the
                reference's --iree-input-demote-f32-to-f16)
- int8        : same integer arithmetic through plain XLA ops
- f32         : float model

Headline = frames/s/chip at the best measured (path, batch); batch-1
device latency reported alongside (reference-style serve loop). MFU uses
the XLA-reported FLOPs of the f32 program (the model's canonical work;
integer-path multiply-accumulates counted identically) against the v5e
bf16 peak of 197 TFLOP/s.

Prints ONE JSON line. Baseline: the reference publishes no end-to-end
fps/latency (BASELINE.md); the north star is >=10k frames/s/chip
(BASELINE.json), so vs_baseline = headline / 10_000.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp

NORTH_STAR_FPS = 10_000.0
PEAK_FLOPS = 197e12  # v5e bf16 peak (f32 matmuls run as bf16 passes)


def main() -> None:
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

    # Load the trained float checkpoint FIRST so the fallback calibration
    # derives int8 scales/weights from the weights actually benchmarked.
    ckpt_dir = pathlib.Path(__file__).parent / "checkpoints"
    if (ckpt_dir / "model_float.npz").exists():
        params = params_io.load_params(str(ckpt_dir / "model_float.npz"), params)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = QZ.calibrate_ptq(CFG, params, frames_cal)
    if (ckpt_dir / "model_int8.npz").exists():
        int_params = params_io.load_params(
            str(ckpt_dir / "model_int8.npz"), int_params
        )
    params = M.freeze_for_inference(CFG, params)

    # XLA paths run the feature-last (nhwc) tokenizer/fusion glue — a
    # numeric drop-in (f32 summation order) measured ~2% faster at batch
    # 1024 (conv + fusion layouts) and neutral at batch 1.
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
        else:
            fwd = lambda p, ip, f, v, q, s: M.forward(
                CFG, p, f, v, q, s, encoder_layout="nhwc"
            )

        @jax.jit
        def step(p, ip, frame_u8, vel, quat, state):
            frame = frame_u8.astype(jnp.float32) / 255.0
            return fwd(p, ip, frame, vel, quat, state)

        return step

    paths = ("f32", "int8", "int8_bf16", "pallas", "pallas_bf16")
    results: dict[str, dict] = {}
    flops_per_frame = None

    for batch, ncalls in ((1, 80), (1024, 12)):
        vel = jnp.ones((batch, 1), jnp.float32)
        quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (batch, 1))
        state = M.zero_state(CFG, batch)
        # Distinct frame per call: the relay memoizes identical re-invocations.
        frames = [
            jax.random.randint(
                jax.random.PRNGKey(i), (batch, 1, 60, 90), 0, 256, jnp.uint8
            )
            for i in range(ncalls + 1)
        ]
        jax.block_until_ready(frames)
        for kind in paths:
            step = make_step(kind)
            args = [
                (params, int_params, frames[i + 1], vel, quat, state)
                for i in range(ncalls)
            ]
            warm = (params, int_params, frames[0], vel, quat, state)
            if kind == "f32" and batch == 1 and flops_per_frame is None:
                comp = step.lower(*warm).compile()
                flops_per_frame = comp.cost_analysis().get("flops", 0.0)
            t = device_time_per_call(step, args, warmup_args=warm)
            if t.n_executions < ncalls:  # trace missed tail executions
                t = device_time_per_call(step, args, warmup_args=warm, settle_s=3.0)
            ms = t.per_call_ms
            results[f"{kind}_b{batch}"] = {
                "device_ms_per_call": round(ms, 4),
                "fps": round(batch / ms * 1e3, 1),
                "mfu_pct": round(
                    batch * flops_per_frame / (ms / 1e3) / PEAK_FLOPS * 100, 3
                ),
                "n_timed": t.n_executions,
            }

    # The two-kernel deployment config (fused Pallas encoder + fused
    # Pallas decoder/LSTM/head tail, VERDICT r1 item 2): serving-shaped
    # (batch 1, raw (60, 90) camera frame, post-processing included — it
    # does strictly MORE work per frame than the other batch-1 paths).
    # The step donates its state argument, so each timed call gets a
    # fresh state buffer.
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_fused_serving_step,
    )

    fused_step = make_fused_serving_step(CFG)
    fused_imgs = [
        jax.random.randint(jax.random.PRNGKey(1000 + i), (60, 90), 0, 256,
                           jnp.uint8)
        for i in range(81)
    ]
    fused_common = (jnp.float32(5.0), jnp.float32(1.0),
                    jnp.asarray([1.0, 0, 0, 0], jnp.float32))
    t = device_time_per_call(
        fused_step,
        [(params, int_params, fused_imgs[i + 1], *fused_common,
          M.zero_state(CFG, 1))
         for i in range(80)],
        warmup_args=(params, int_params, fused_imgs[0], *fused_common,
                     M.zero_state(CFG, 1)),
    )
    results["fused_b1"] = {
        "device_ms_per_call": round(t.per_call_ms, 4),
        "fps": round(1.0 / t.per_call_ms * 1e3, 1),
        "mfu_pct": round(
            flops_per_frame / (t.per_call_ms / 1e3) / PEAK_FLOPS * 100, 3
        ),
        "n_timed": t.n_executions,
    }

    # The whole-model megakernel (ops/pallas/model_kernel.py): tokenizer
    # conv+resize in XLA, everything else — LN, int8 encoder, fusion,
    # int8 per-channel decoder+LSTM, head, postprocess — in ONE
    # pallas_call with grid-pipelined weight DMA. The flagship serving
    # configuration.
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.model_kernel import (
        make_flagship_kernel_params,
    )
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_serving_step,
    )

    kp = make_flagship_kernel_params(CFG, params, int_params)
    mega_step = make_serving_step(CFG, "mega")
    t = device_time_per_call(
        mega_step,
        [(kp, None, fused_imgs[i + 1], *fused_common, M.zero_state(CFG, 1))
         for i in range(80)],
        warmup_args=(kp, None, fused_imgs[0], *fused_common,
                     M.zero_state(CFG, 1)),
    )
    results["mega_b1"] = {
        "device_ms_per_call": round(t.per_call_ms, 4),
        "fps": round(1.0 / t.per_call_ms * 1e3, 1),
        "mfu_pct": round(
            flops_per_frame / (t.per_call_ms / 1e3) / PEAK_FLOPS * 100, 3
        ),
        "n_timed": t.n_executions,
    }

    best_kind, best = max(
        ((k, v) for k, v in results.items() if k.endswith("_b1024")),
        key=lambda kv: kv[1]["fps"],
    )
    b1 = {k: v for k, v in results.items() if k.endswith("_b1")}
    best_b1_kind, best_b1 = max(b1.items(), key=lambda kv: kv[1]["fps"])

    out = {
        "metric": "frames/sec/chip (flagship serving, true device time)",
        "value": best["fps"],
        "unit": "frames/s",
        "vs_baseline": round(best["fps"] / NORTH_STAR_FPS, 4),
        "headline_config": best_kind,
        "headline_mfu_pct": best["mfu_pct"],
        "batch1_best_config": best_b1_kind,
        "batch1_fps": best_b1["fps"],
        "batch1_device_us": round(best_b1["device_ms_per_call"] * 1e3, 2),
        "model_flops_per_frame": flops_per_frame,
        "paths": results,
        "timing_source": "jax.profiler device trace (host wall-time is a relay artifact on this platform; round-1 numbers were inflated ~30x)",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
