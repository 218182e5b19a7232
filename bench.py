"""Benchmark: camera->command serving throughput on one chip.

Runs the flagship ITAViTLSTM serving step (preprocess + model, one jit)
on the default JAX backend (the real TPU under the driver) and prints ONE
JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline note: the reference publishes NO end-to-end fps/latency
(BASELINE.md) — its north-star target for this rebuild is >=10k
frames/sec/chip (BASELINE.json), so vs_baseline = value / 10_000.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_FPS = 10_000.0


def main() -> None:
    from drone_oa_iree_vit_accelerator_tpu.core import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M

    params = M.init_params(CFG, jax.random.PRNGKey(0))

    @jax.jit
    def step(params, frame_u8, vel, quat, state):
        # Fused preprocessing (reference does this on the host in C++,
        # samples/inference_udp_FPGA_custom_dispatch/main.cpp:168-183):
        # u8 depth frame -> f32/255 normalize happens inside the jit.
        frame = frame_u8.astype(jnp.float32) / 255.0
        return M.forward(CFG, params, frame, vel, quat, state)

    batch = 1  # latency-oriented, like the reference serve loop
    frame = jnp.zeros((batch, 1, 60, 90), jnp.uint8)
    vel = jnp.ones((batch, 1), jnp.float32)
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (batch, 1))
    state = M.zero_state(CFG, batch)

    # Warmup / compile.
    cmd, state_w = step(params, frame, vel, quat, state)
    jax.block_until_ready(cmd)

    iters = 300
    lat = []
    st = state
    for _ in range(iters):
        t0 = time.perf_counter()
        cmd, st = step(params, frame, vel, quat, st)
        jax.block_until_ready(cmd)
        lat.append(time.perf_counter() - t0)

    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[int(len(lat) * 0.99)]
    fps = batch / p50

    result = {
        "metric": "frames/sec/chip (flagship serving step, batch=1, fp32)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        "p50_ms": round(p50 * 1e3, 4),
        "p99_ms": round(p99 * 1e3, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
