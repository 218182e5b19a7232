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


def test_31bit_requant_variant():
    """The reference's ONNX backup flow encodes requant multipliers at 31
    bits (onnx_ITA_verification.py:62-69: mult = round(scale * 2**31),
    shift = 31, int64 accumulate). ops/quant parameterizes the same
    encoding via bits=; exercise it at 31 against the oracle and the
    float rescale (VERDICT r2: close the 31-bit gap)."""
    import ita_oracle as oracle
    from drone_oa_iree_vit_accelerator_tpu.ops import quant as Q

    rng = np.random.default_rng(7)
    accs = rng.integers(-3_000_000, 3_000_000, size=(64,)).astype(np.int64)
    for s64 in [0.0137, 0.25, 1.0 / 3.0, 0.9, 5e-4]:
        # f32-quantize the scale first: the device path (hw_params_jnp)
        # sees f32, and a 24-bit mantissa makes mant * 2**31 exact.
        s = float(np.float32(s64))
        # (a) host frexp encoding agrees with the independent oracle.
        assert Q.calculate_hw_params(s, bits=31) == oracle.calculate_hw_params(
            s, bits=31
        )
        # (b) jnp (traceable) encoding agrees with the host encoding.
        mult, shift = Q.calculate_hw_params(s, bits=31)
        mj, sj = Q.hw_params_jnp(jnp.float32(s), bits=31)
        assert (int(mj), int(sj)) == (mult, shift)
        # (c) 31-bit requant (int64, oracle arithmetic) reproduces the
        # float rescale EXACTLY on every sample — the point of the wide
        # multiplier (8-bit params are only within 1 LSB). half_up vs
        # floor(x+0.5): identical by construction here.
        got = oracle.requant(accs, mult, shift, rounding="half_up")
        want = np.clip(np.floor(accs * np.float64(s) + 0.5), -128, 127)
        np.testing.assert_array_equal(got, want.astype(np.int8))
        # ... and the reference's fixed-shift form (mult=round(s*2**31),
        # shift=31, onnx_ITA_verification.py:62-69) agrees within 1 LSB
        # (it drops exponent bits for s < 0.5, so exact equality is not
        # guaranteed at ties).
        m_fix = int(round(s * 2**31))
        got_fix = oracle.requant(accs, m_fix, 31, rounding="half_up")
        assert int(np.abs(got.astype(np.int32) - got_fix.astype(np.int32)).max()) <= 1


def test_tokenizer_forward_nchw_kron_path_matches_small_batch():
    """tokenizer_forward's b>=64 kron-resize branch (models/layers.py)
    equals batched sub-64 calls through the two-stage bilinear_resize
    path — pins the batch-size-dependent numeric fork in the NCHW
    tokenizer (ADVICE r2)."""
    from drone_oa_iree_vit_accelerator_tpu.models import layers as L

    key = jax.random.PRNGKey(11)
    params = M.init_params(CFG, key)
    frames = jax.random.uniform(key, (64, 1, 60, 90), jnp.float32)
    big = L.tokenizer_forward(frames, params["tokenizer"], CFG)
    small = jnp.concatenate(
        [
            L.tokenizer_forward(frames[i : i + 16], params["tokenizer"], CFG)
            for i in range(0, 64, 16)
        ]
    )
    np.testing.assert_allclose(big, small, rtol=1e-4, atol=1e-5)


def test_tokenizer_factored2_matches_factored():
    """The B-major 2-GEMM tokenizer (tokenizer_tokens_factored2 — kept
    as a measured-slower alternative, see its docstring) computes the
    same linear operator as the 3-GEMM factored form up to f32
    summation order."""
    from drone_oa_iree_vit_accelerator_tpu.models import layers as L

    key = jax.random.PRNGKey(13)
    params = M.init_params(CFG, key)
    frames = jax.random.uniform(key, (8, 1, 60, 90), jnp.float32)
    a = L.tokenizer_tokens_factored(frames, params["tokenizer"], CFG)
    b = L.tokenizer_tokens_factored2(frames, params["tokenizer"], CFG)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-3)
