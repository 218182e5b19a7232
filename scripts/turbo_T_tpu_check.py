"""On-TPU verification + A/B for the TRANSPOSED turbo pipeline
(encoder='pallas_T': tokenizer_tokens_factored_T -> ita_encoder_block_T
-> e-major tail), VERDICT r4 items 2+3.

Checks, in order:
1. Mosaic compiles the T-kernel (the interpret tests can't prove this).
2. Compiled parity: pallas_T vs pallas turbo outputs at b1024, both
   softmax modes (expect <= glue tolerance; integer region identical,
   LN reduction order differs).
3. Device-trace timing: pallas vs pallas_T at b1024, onepass+streaming
   (distinct frames per call; params as jit args — verify-skill rules).

Writes docs/turbo_T_report.json.

Run:  python scripts/turbo_T_tpu_check.py   (needs the real TPU)
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import params_io
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu import quant as QZ
from drone_oa_iree_vit_accelerator_tpu.quant.batched import (
    make_tail,
    turbo_forward,
)
from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (
    device_time_per_call,
)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    root = pathlib.Path(__file__).resolve().parents[1]
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    ckpt = root / "checkpoints"
    params = params_io.load_params(str(ckpt / "model_float.npz"), params)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = QZ.calibrate_ptq(CFG, params, frames_cal)
    int_params = params_io.load_params(
        str(ckpt / "model_int8.npz"), int_params
    )
    tail = make_tail(CFG, params)
    tail_t = make_tail(CFG, params, e_major=True)
    params = M.freeze_for_inference(CFG, params)

    def make_step(encoder, mode):
        t = tail_t if encoder == "pallas_T" else tail

        @jax.jit
        def step(p, ip, frame_u8, vel, quat, state):
            frame = frame_u8.astype(jnp.float32) / 255.0
            return turbo_forward(
                CFG, p, ip, t, frame, vel, quat, state,
                encoder=encoder, max_nb=8, softmax_mode=mode,
            )

        return step

    b = 1024
    vel = jnp.ones((b, 1), jnp.float32)
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
    state = M.zero_state(CFG, b)
    report: dict = {"batch": b, "parity": {}, "timing_us": {}}

    # ---- 1+2: compile + compiled parity ----
    frame0 = jax.random.randint(
        jax.random.PRNGKey(7), (b, 1, 60, 90), 0, 256, jnp.uint8
    )
    for mode in ("onepass", "streaming"):
        ref, st_ref = make_step("pallas", mode)(
            params, int_params, frame0, vel, quat, state
        )
        got, st = make_step("pallas_T", mode)(
            params, int_params, frame0, vel, quat, state
        )
        cmd_err = float(np.abs(np.asarray(got) - np.asarray(ref)).max())
        h_err = float(np.abs(np.asarray(st.h) - np.asarray(st_ref.h)).max())
        print(f"[parity {mode}] cmd max err {cmd_err:.3e}  h {h_err:.3e}",
              flush=True)
        report["parity"][mode] = {"cmd_max_err": cmd_err, "h_max_err": h_err}
        assert cmd_err < 5e-2 and h_err < 5e-2, (cmd_err, h_err)

    # ---- 3: device timing ----
    ncalls = 12
    frames = [
        jax.random.randint(
            jax.random.PRNGKey(1000 + i), (b, 1, 60, 90), 0, 256, jnp.uint8
        )
        for i in range(ncalls + 1)
    ]
    jax.block_until_ready(frames)
    for mode in ("onepass", "streaming"):
        for enc in ("pallas", "pallas_T"):
            step = make_step(enc, mode)
            args = [
                (params, int_params, frames[i + 1], vel, quat, state)
                for i in range(ncalls)
            ]
            warm = (params, int_params, frames[0], vel, quat, state)
            t = device_time_per_call(step, args, warmup_args=warm)
            if t.n_executions < ncalls:
                t = device_time_per_call(
                    step, args, warmup_args=warm, settle_s=3.0
                )
            us = t.percentile_ms(50) * 1000.0
            report["timing_us"][f"{enc}_{mode}"] = us
            print(f"[time {mode:9s} {enc:9s}] p50 {us:8.1f} us/call "
                  f"({b / us * 1e6 / 1e6:.3f} M fps)", flush=True)

    out = root / "docs" / "turbo_T_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
