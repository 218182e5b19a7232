"""On-TPU verification + timing for the FLEET MEGAKERNEL
(make_fleet_mega_step / flagship_fused_step_fleet), VERDICT r4 item 7.

1. Mosaic compile + parity: fleet-mega step vs the turbo fleet step
   (glue tolerance) and vs the b1 megakernel per row (tight tolerance —
   same kernel family).
2. Device-trace timing: fleet tick at capacity 8/16/32, mega vs turbo
   (distinct frames/call, params as jit args).

Writes docs/fleet_mega_report.json.
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
from drone_oa_iree_vit_accelerator_tpu.quant.batched import make_tail
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    make_fleet_fused_step,
    make_fleet_mega_step,
    make_fleet_step,
    make_serving_step,
)
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.model_kernel import (
    make_flagship_kernel_params,
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
    int_params, _ = QZ.calibrate_ptq(
        CFG, params, jax.random.randint(key, (8, 1, 60, 90), 0, 256,
                                        jnp.uint8)
    )
    int_params = params_io.load_params(
        str(ckpt / "model_int8.npz"), int_params
    )
    kp = make_flagship_kernel_params(CFG, params, int_params)
    tail_t = make_tail(CFG, params, e_major=True)
    fparams = M.freeze_for_inference(CFG, params)

    report: dict = {"parity": {}, "tick_us": {}}

    def fleet_args(cap, seed):
        r = np.random.RandomState(seed)
        frames = jnp.asarray(
            r.randint(0, 256, (cap, 60, 90)).astype(np.uint8)
        )
        vel = jnp.asarray(r.uniform(3, 6, cap).astype(np.float32))
        posx = jnp.asarray(r.uniform(0, 10, cap).astype(np.float32))
        quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (cap, 1))
        active = jnp.asarray(r.rand(cap) < 0.9)
        return frames, vel, posx, quat, active

    # ---- parity at capacity 8 ----
    cap = 8
    mega = make_fleet_mega_step(CFG)
    turbo = make_fleet_step(CFG, "turbo")
    state = M.zero_state(CFG, cap)
    frames, vel, posx, quat, active = fleet_args(cap, 7)
    cm, stm = mega(kp, None, None, frames, vel, posx, quat, active, state)
    ct, stt = turbo(
        fparams, int_params, tail_t, frames, vel, posx, quat, active,
        M.zero_state(CFG, cap),
    )
    err = float(np.abs(np.asarray(cm) - np.asarray(ct)).max())
    print(f"[parity] fleet-mega vs turbo cmd max err {err:.4e}", flush=True)
    report["parity"]["vs_turbo_cmd_max_err"] = err
    assert err < 0.3, err  # different kernel families, bf16 glue

    # per-row vs b1 megakernel (same family — tight)
    b1 = make_serving_step(CFG, path="mega")
    errs = []
    for kk in range(cap):
        c1, _ = b1(
            kp, None, frames[kk], vel[kk], posx[kk], quat[kk],
            M.LSTMState(
                jnp.zeros((3, 1, 128)), jnp.zeros((3, 1, 128))
            ),
        )
        errs.append(float(np.abs(np.asarray(c1) - np.asarray(cm[kk])).max()))
    print(f"[parity] fleet-mega vs b1-mega per-row max err {max(errs):.2e}",
          flush=True)
    report["parity"]["vs_b1_mega_max_err"] = max(errs)
    assert max(errs) < 1e-3, errs

    # ---- fused-path parity ----
    fused = make_fleet_fused_step(CFG)
    cf, stf = fused(
        fparams, int_params, tail_t, frames, vel, posx, quat, active,
        M.zero_state(CFG, cap),
    )
    errf = float(np.abs(np.asarray(cf) - np.asarray(ct)).max())
    print(f"[parity] fleet-fused vs turbo cmd max err {errf:.4e}", flush=True)
    report["parity"]["fused_vs_turbo_cmd_max_err"] = errf
    assert errf < 0.3, errf

    # Row-major turbo variant (pre-r5 fleet deployment) for the A/B.
    from drone_oa_iree_vit_accelerator_tpu.quant.batched import (
        make_tail as _mt,
        turbo_forward,
    )
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        postprocess_velocity,
    )

    tail_rm = _mt(CFG, params_io.load_params(
        str(ckpt / "model_float.npz"),
        M.init_params(CFG, jax.random.PRNGKey(0)),
    ))

    def _turbo_rm_step(p, ip, tl, frames_u8, vel, posx, quat, active,
                       state):
        frames = frames_u8.astype(jnp.float32)[:, None, :, :] / 255.0
        cmd, new_state = turbo_forward(
            CFG, p, ip, tl, frames, vel[:, None], quat, state,
            encoder="pallas",
        )
        out = jax.vmap(postprocess_velocity)(cmd, vel, posx)
        m = active[None, :, None]
        return out, M.LSTMState(
            jnp.where(m, new_state.h, state.h),
            jnp.where(m, new_state.c, state.c),
        )

    turbo_rm = jax.jit(_turbo_rm_step, donate_argnums=(8,))

    # ---- timing ----
    ncalls = 40
    for cap in (8, 16, 32):
        argsets = [fleet_args(cap, 100 + i) for i in range(ncalls + 1)]
        jax.block_until_ready(argsets)
        for name, step, p, ip, tl in (
            ("mega", make_fleet_mega_step(CFG), kp, None, None),
            ("turbo", make_fleet_step(CFG, "turbo"), fparams, int_params,
             tail_t),
            ("turbo_rm", turbo_rm, fparams, int_params, tail_rm),
            ("fused", make_fleet_fused_step(CFG), fparams, int_params,
             tail_t),
        ):
            # The fleet step DONATES the state arg: every call needs its
            # own fresh state buffer (a reused donated buffer raises
            # INVALID_ARGUMENT on call 2).
            args = [
                (p, ip, tl, *argsets[i + 1], M.zero_state(CFG, cap))
                for i in range(ncalls)
            ]
            warm = (p, ip, tl, *argsets[0], M.zero_state(CFG, cap))
            t = device_time_per_call(step, args, warmup_args=warm)
            if t.n_executions < ncalls:
                t = device_time_per_call(
                    step, args, warmup_args=warm, settle_s=3.0
                )
            us = t.percentile_ms(50) * 1000.0
            report["tick_us"][f"{name}_cap{cap}"] = round(us, 2)
            print(f"[tick cap={cap:2d} {name:5s}] p50 {us:7.1f} us", flush=True)

    out = root / "docs" / "fleet_mega_report.json"
    out.write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
