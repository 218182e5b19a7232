"""Validate the AOT artifact (.vmfb analog) on the real TPU.

VERDICT r1 item 6: pipeline/aot.py round-tripped only under the CPU
backend; the reference's deploy story is the compiled artifact running on
the target (samples/inference_udp_FPGA_custom_dispatch/CMakeLists.txt:
42-53 — the .vmfb is what flies). This script is the TPU analog:

  phase export   (TPU process)  trained checkpoints -> model.jaxexport
  phase serve    (FRESH process) reload WITHOUT model code having traced
                 anything, serve frames on the chip, check parity vs the
                 jit path, measure true device-time latency.

Writes docs/aot_tpu_report.json. Run:

    python scripts/aot_tpu_check.py --phase export
    python scripts/aot_tpu_check.py --phase serve
"""

import argparse
import json
import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

ARTIFACT = pathlib.Path("/tmp/model_flagship.jaxexport")
REPORT = ROOT / "docs" / "aot_tpu_report.json"


def phase_export() -> None:
    from drone_oa_iree_vit_accelerator_tpu.core.config import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import params_io, vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import export_serving_step
    from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq

    like = M.init_params(CFG, jax.random.PRNGKey(0))
    params = params_io.load_params(str(ROOT / "checkpoints/model_float.npz"), like)
    frames_cal = jax.random.randint(
        jax.random.PRNGKey(1), (8, 1, 60, 90), 0, 256, jnp.uint8
    )
    int_like, _ = calibrate_ptq(CFG, params, frames_cal)
    int_params = params_io.load_params(
        str(ROOT / "checkpoints/model_int8.npz"), int_like
    )
    p = export_serving_step(
        ARTIFACT, CFG, params=params, int_params=int_params, path="mega"
    )
    print(f"exported -> {p} ({p.stat().st_size} bytes) on "
          f"{jax.default_backend()}")


def phase_serve() -> None:
    assert jax.default_backend() == "tpu", (
        f"AOT TPU check needs the TPU backend, got {jax.default_backend()}"
    )
    from drone_oa_iree_vit_accelerator_tpu.core.config import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import load_serving_step
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import make_serving_step
    from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (
        device_time_per_call,
    )

    step, params, int_params, meta = load_serving_step(ARTIFACT)
    jstep = jax.jit(step)

    state = M.zero_state(CFG, 1)
    n = 40
    images = [
        jax.random.randint(jax.random.PRNGKey(i), (60, 90), 0, 256, jnp.uint8)
        for i in range(n + 1)
    ]
    vel, pos_x = jnp.float32(5.0), jnp.float32(1.0)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)

    # Parity: AOT-reloaded program vs in-process jit of the same path
    # (for path='mega' the bundled params ARE the kernel-operand pytree).
    live = make_serving_step(CFG, meta["path"])
    cmd_aot, _ = jstep(images[0], vel, pos_x, quat, state)
    cmd_live, _ = live(params, int_params, images[0], vel, pos_x, quat,
                       M.zero_state(CFG, 1))
    parity = float(jnp.max(jnp.abs(cmd_aot - cmd_live)))

    # Serve a frame sequence (recurrent state threaded) — the artifact
    # drives the same loop serve.py runs behind UDP.
    st = M.zero_state(CFG, 1)
    outs = []
    for img in images[:10]:
        cmd, st = jstep(img, vel, pos_x, quat, st)
        outs.append(np.asarray(cmd))
    assert np.all(np.isfinite(np.stack(outs)))

    # True device-time latency of the reloaded program.
    args = [(images[i + 1], vel, pos_x, quat, state) for i in range(n)]
    t = device_time_per_call(jstep, args, warmup_args=(images[0], vel, pos_x,
                                                      quat, state))

    report = {
        "artifact_bytes": ARTIFACT.stat().st_size,
        "meta": meta,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "parity_vs_live_jit_max_abs": parity,
        "served_frames": len(outs),
        "device_us_per_frame": round(t.per_call_ms * 1e3, 2),
        "n_timed": t.n_executions,
        "note": "artifact reloaded in a fresh process via jax.export "
        "deserialize; no model-code tracing needed at serve time "
        "(reference deploy analog: .vmfb on the A53+FPGA target)",
    }
    REPORT.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("export", "serve", "both"),
                    default="both")
    args = ap.parse_args()
    if args.phase == "both":
        for ph in ("export", "serve"):
            r = subprocess.run(
                [sys.executable, __file__, "--phase", ph], cwd=ROOT
            )
            if r.returncode:
                sys.exit(r.returncode)
    elif args.phase == "export":
        phase_export()
    else:
        phase_serve()


if __name__ == "__main__":
    main()
