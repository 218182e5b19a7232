"""PTQ calibration, partial softmax, bf16 path, and the compile matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import MODEL_ZOO, ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops.ita_softmax import ita_partial_softmax
from drone_oa_iree_vit_accelerator_tpu.pipeline import wire
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import make_serving_step
from drone_oa_iree_vit_accelerator_tpu import quant as QZ


def test_ptq_calibration_produces_working_int_model(rng):
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    frames = jnp.asarray(
        rng.integers(0, 256, (16, 1, 60, 90)), jnp.uint8
    )
    int_params, observers = QZ.calibrate_ptq(CFG, params, frames, batch_size=8)
    assert bool(observers.attn[0].in_.initialized)
    assert bool(observers.ffn[0].fc2.initialized)
    # Converted model runs and tracks the float model.
    f = frames[:2].astype(jnp.float32) / 255.0
    vel = jnp.ones((2, 1))
    quat = jnp.zeros((2, 4)).at[:, 0].set(1.0)
    cmd_i, _ = QZ.int8_forward(CFG, params, int_params, f, vel, quat)
    cmd_f, _ = M.forward(CFG, params, f, vel, quat)
    assert float(jnp.max(jnp.abs(cmd_i - cmd_f))) < 0.5


def test_ptq_small_calibration_set(rng):
    params = M.init_params(CFG, jax.random.PRNGKey(1))
    frames = jnp.asarray(rng.integers(0, 256, (3, 1, 60, 90)), jnp.uint8)
    int_params, observers = QZ.calibrate_ptq(CFG, params, frames, batch_size=8)
    assert bool(observers.attn[0].in_.initialized)  # n < batch_size handled


def test_partial_softmax_topk_semantics(rng):
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32) * 3)
    p = np.asarray(ita_partial_softmax(x, k=8))
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
    # Top-1 position preserved; at least the top-8 entries dominate.
    np.testing.assert_array_equal(p.argmax(-1), np.asarray(x).argmax(-1))
    full = np.asarray(jax.nn.softmax(x, axis=-1))
    topk_idx = np.argsort(np.asarray(x), axis=-1)[:, -8:]
    mass = np.take_along_axis(p, topk_idx, -1).sum(-1)
    assert np.all(mass > 0.5)


def test_bf16_serving_path_tracks_f32():
    params = M.init_params(CFG, jax.random.PRNGKey(2))
    args = (
        jnp.full(wire.IMAGE_SHAPE, 77, jnp.uint8),
        jnp.float32(3.0),
        jnp.float32(6.0),
        jnp.zeros((4,), jnp.float32),
    )
    # Fresh state per call: the serving step donates the state buffers.
    cmd16, st16 = make_serving_step(CFG, "bf16")(
        params, None, *args, M.zero_state(CFG, 1)
    )
    cmd32, _ = make_serving_step(CFG, "f32")(
        params, None, *args, M.zero_state(CFG, 1)
    )
    assert cmd16.dtype == jnp.float32 and st16.h.dtype == jnp.float32
    # Half precision: loose agreement (the reference accepts full-f16).
    np.testing.assert_allclose(
        np.asarray(cmd16), np.asarray(cmd32), atol=0.15, rtol=0.15
    )


@pytest.mark.parametrize("cfg", list(MODEL_ZOO.values()), ids=lambda c: c.name)
@pytest.mark.parametrize("path", ["f32", "int8"])
def test_compile_matrix_all_variants(cfg, path):
    """Op-coverage regression net: every model variant x serving path
    lowers and compiles (the analog of the reference's batch dummy-model
    compile sweep, scripts/compile_flow_dummy_models.sh)."""
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    int_params = None
    if path == "int8":
        from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
            _calibrate_random,
        )

        int_params = _calibrate_random(cfg, params)
    step = make_serving_step(cfg, path)
    args = (
        params, int_params,
        jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8),
        jnp.float32(1.0), jnp.float32(5.0), jnp.zeros((4,), jnp.float32),
        M.zero_state(cfg, 1),
    )
    compiled = step.lower(*args).compile()
    cmd, _ = compiled(*args)
    assert cmd.shape == (3,)
