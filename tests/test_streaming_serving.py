"""End-to-end threading of the hardware-default streaming softmax.

The reference's PyITA verification default is the ITA_N=16 streaming
partial softmax (reference tests/export_and_validation_W_B.py:527); the
kernels have supported it since r2, but VERDICT r3 flagged that nothing
in the deployment path ever *selected* it. These tests pin the new
threading: make_serving_step / ServingEngine / sim.evaluate accept
``softmax_mode`` and actually change the computed program (not a dead
flag).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core.config import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu import quant as QZ
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    make_serving_step,
    postprocess_velocity,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(3)
    params = M.init_params(CFG, key)
    cal = jax.random.randint(key, (4, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = calibrate_ptq(CFG, params, cal)
    img = jax.random.randint(jax.random.PRNGKey(7), (60, 90), 0, 256, jnp.uint8)
    return params, int_params, img


def _run(step, params, int_params, img, n=3):
    st = M.zero_state(CFG, 1)
    vel = jnp.float32(4.0)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    outs = []
    for t in range(n):
        cmd, st = step(params, int_params, img, vel, jnp.float32(3.0 + t), quat, st)
        outs.append(np.asarray(cmd))
    return np.stack(outs)


def test_serving_step_streaming_matches_direct_forward(setup):
    """make_serving_step(int8, streaming) == int8_forward(streaming) +
    postprocess — the flag reaches the integer pipeline. (Two separate
    jit programs: XLA may fuse the float glue differently, so compare to
    f32 roundoff, not bit-level.)"""
    params, int_params, img = setup
    step = make_serving_step(CFG, "int8", softmax_mode="streaming")
    got = _run(step, params, int_params, img, n=2)

    st = M.zero_state(CFG, 1)
    vel = jnp.float32(4.0)
    quat = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    frame = img.astype(jnp.float32)[None, None] / 255.0
    want = []
    for t in range(2):
        cmd, st = QZ.int8_forward(
            CFG, params, int_params, frame, vel[None, None], quat, st,
            softmax_mode="streaming",
        )
        want.append(np.asarray(
            postprocess_velocity(cmd[0], vel, jnp.float32(3.0 + t))
        ))
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-5)


def test_streaming_flag_not_dead(setup):
    """onepass and streaming produce different integer programs — the
    two modes round differently at the softmax denominator. Any single
    image can coincide (measured ~25% of random frames are identical),
    so scan a handful: at least one must differ."""
    params, int_params, _ = setup
    sa = make_serving_step(CFG, "int8", softmax_mode="onepass")
    sb = make_serving_step(CFG, "int8", softmax_mode="streaming")
    for s in range(6):
        img = jax.random.randint(
            jax.random.PRNGKey(100 + s), (60, 90), 0, 256, jnp.uint8
        )
        a = _run(sa, params, int_params, img, n=1)
        b = _run(sb, params, int_params, img, n=1)
        if not np.array_equal(a, b):
            return
    raise AssertionError("streaming flag changed nothing over 6 frames")


def test_pallas_streaming_matches_int8_streaming_outcome(setup):
    """The kernel path in streaming mode stays integer-identical to the
    golden streaming path (same guarantee as onepass: float glue may
    reorder f32, the quantized region is bit-exact — so commands agree
    to f32 roundoff)."""
    params, int_params, img = setup
    a = _run(make_serving_step(CFG, "int8", softmax_mode="streaming"),
             params, int_params, img)
    b = _run(make_serving_step(CFG, "pallas", softmax_mode="streaming"),
             params, int_params, img)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_batched_and_fleet_builders_take_softmax_mode(setup):
    """make_batched_serving_step / make_fleet_step accept softmax_mode
    and produce a runnable program in streaming mode (the fleet/turbo
    deployment surface — the last serving builder without the flag)."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_batched_serving_step,
        make_fleet_step,
    )
    from drone_oa_iree_vit_accelerator_tpu.quant.batched import make_tail

    params, int_params, _ = setup
    tail = make_tail(CFG, params)
    b = 2
    frames = jax.random.randint(
        jax.random.PRNGKey(8), (b, 60, 90), 0, 256, jnp.uint8
    )
    vel = jnp.full((b,), 4.0)
    posx = jnp.full((b,), 3.0)
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (b, 1))

    bstep = make_batched_serving_step(CFG, softmax_mode="streaming")
    cmds, _ = bstep(params, int_params, tail, frames, vel, posx, quat,
                    M.zero_state(CFG, b))
    assert cmds.shape == (b, 3) and bool(jnp.all(jnp.isfinite(cmds)))

    fstep = make_fleet_step(CFG, softmax_mode="streaming")
    active = jnp.ones((b,), bool)
    fcmds, _ = fstep(params, int_params, tail, frames, vel, posx, quat,
                     active, M.zero_state(CFG, b))
    # Same math for active rows: fleet == batched.
    np.testing.assert_allclose(np.asarray(fcmds), np.asarray(cmds),
                               rtol=1e-5, atol=1e-5)


def test_evaluate_threads_softmax_mode():
    """sim.evaluate(softmax_mode=...) runs and the mode changes
    per-rollout trajectories (closed-loop divergence is chaotic, so we
    only assert both run green and return sane stats)."""
    from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E

    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    for mode in ("onepass", "streaming"):
        s = E.evaluate(
            n_rollouts=2, steps=40, seed=5, path="int8", params=params,
            softmax_mode=mode,
        )
        assert 0.0 <= s["success_rate"] <= 1.0
