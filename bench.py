"""Benchmark: camera->command serving throughput on one chip.

Measures the flagship ITAViTLSTM serving step (fused preprocess + model,
one jit each) on the default JAX backend (the real TPU under the driver):

- int8 path: the deployed configuration — ITA integer attention/FFN
  (int8 MXU matmuls, requant shifts, integer softmax) inside the model,
  converted on-device from QAT observers;
- fp32 path: the float model, for reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline note: the reference publishes NO end-to-end fps/latency
(BASELINE.md) — the north star for this rebuild is >=10k frames/sec/chip
(BASELINE.json), so vs_baseline = value / 10_000.

NOTE: no device-to-host transfer may happen before the timing loops (a
single D2H degrades dispatch latency ~1000x on the axon platform); QAT
calibration and int8 conversion therefore run as jitted device programs.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_FPS = 10_000.0


def _time_step(step, args, state, iters=300):
    cmd, st = step(*args, state)
    jax.block_until_ready(cmd)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        cmd, st = step(*args, st)
        jax.block_until_ready(cmd)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    return lat[len(lat) // 2], lat[int(len(lat) * 0.99)]


def main() -> None:
    from drone_oa_iree_vit_accelerator_tpu.core import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu import quant as QZ

    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)

    # On-device QAT calibration + int8 conversion (no host sync).
    @jax.jit
    def calibrate(params, obs, x):
        attn_fn, ffn_fn, collect = QZ.qat_block_fns(params, obs, CFG.H)
        for i in range(CFG.num_layers):
            attn_fn(i, x)
            ffn_fn(i, x)
        return collect()

    obs = calibrate(
        params,
        QZ.QATObservers.init(CFG.num_layers),
        0.5 * jax.random.normal(key, (2, CFG.S, CFG.E)),
    )
    int_params = jax.jit(QZ.convert_model, static_argnums=2)(params, obs, CFG.H)

    @jax.jit
    def step_int8(params, int_params, frame_u8, vel, quat, state):
        frame = frame_u8.astype(jnp.float32) / 255.0
        return QZ.int8_forward(CFG, params, int_params, frame, vel, quat, state)

    @jax.jit
    def step_f32(params, frame_u8, vel, quat, state):
        frame = frame_u8.astype(jnp.float32) / 255.0
        return M.forward(CFG, params, frame, vel, quat, state)

    batch = 1  # latency-oriented, like the reference serve loop
    frame = jnp.zeros((batch, 1, 60, 90), jnp.uint8)
    vel = jnp.ones((batch, 1), jnp.float32)
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (batch, 1))
    state = M.zero_state(CFG, batch)

    p50_i, p99_i = _time_step(
        lambda f, v, q, s: step_int8(params, int_params, f, v, q, s),
        (frame, vel, quat),
        state,
    )
    p50_f, p99_f = _time_step(
        lambda f, v, q, s: step_f32(params, f, v, q, s), (frame, vel, quat), state
    )

    fps = batch / p50_i
    result = {
        "metric": "frames/sec/chip (flagship int8 serving step, batch=1)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        "int8_p50_ms": round(p50_i * 1e3, 4),
        "int8_p99_ms": round(p99_i * 1e3, 4),
        "f32_p50_ms": round(p50_f * 1e3, 4),
        "f32_p99_ms": round(p99_f * 1e3, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
