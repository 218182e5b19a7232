"""Unit tests for the core quantization math (ops/quant.py).

Oracles are independent NumPy transliterations of the reference semantics
(tests/export_and_validation_W_B.py, scripts/export_model.py) — written
here from the spec, not imported from anywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.ops import quant as Q


def test_symmetric_scale_matches_torch_convention():
    # torch per_tensor_symmetric: scale = max(|min|,|max|) / 127.5
    s = Q.symmetric_scale(jnp.float32(-3.0), jnp.float32(2.0))
    assert np.isclose(float(s), 3.0 / 127.5)
    s = Q.symmetric_scale(jnp.float32(-0.5), jnp.float32(4.0))
    assert np.isclose(float(s), 4.0 / 127.5)


def test_quantize_round_half_even_and_clamp(rng):
    x = rng.normal(size=(64,)).astype(np.float32) * 10
    scale = 0.1
    q = np.asarray(Q.quantize(jnp.asarray(x), jnp.float32(scale)))
    expected = np.clip(np.round(x / scale), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(q, expected)
    # Ties round to even like torch/numpy.
    q = Q.quantize(jnp.asarray([0.05, 0.15, -0.05]), jnp.float32(0.1))
    np.testing.assert_array_equal(np.asarray(q), [0, 2, 0])


def test_fake_quant_roundtrip(rng):
    x = rng.normal(size=(32, 16)).astype(np.float32)
    scale = jnp.float32(np.abs(x).max() / 127.5)
    y = Q.fake_quant(jnp.asarray(x), scale)
    assert float(jnp.max(jnp.abs(y - x))) <= float(scale) / 2 + 1e-7


def test_fake_quant_ste_gradient_masks_out_of_range():
    scale = jnp.float32(0.1)  # representable range [-12.8, 12.7]
    x = jnp.asarray([0.0, 5.0, 20.0, -20.0, -12.0])
    g = jax.grad(lambda v: jnp.sum(Q.fake_quant_ste(v, scale)))(x)
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 0.0, 0.0, 1.0])


def test_observer_first_update_then_ema(rng):
    st = Q.ObserverState.init()
    x1 = jnp.asarray([-1.0, 2.0])
    st = Q.observe(st, x1)
    assert float(st.min_val) == -1.0 and float(st.max_val) == 2.0
    st = Q.observe(st, jnp.asarray([-3.0, 1.0]), averaging_const=0.5)
    assert np.isclose(float(st.min_val), -1.0 + 0.5 * (-3.0 + 1.0))
    assert np.isclose(float(st.max_val), 2.0 + 0.5 * (1.0 - 2.0))


def test_calculate_hw_params_frexp_encoding():
    # Independent check: mult/2**shift ~= scale with 8-bit mantissa.
    for scale in [0.5, 0.123, 0.0071, 1.9, 0.99937]:
        mult, shift = Q.calculate_hw_params(scale)
        assert 0 < mult <= 256
        assert abs(mult / 2.0**shift - scale) / scale < 2**-8
    assert Q.calculate_hw_params(0.0) == (0, 0)


def test_fold_bias_i32():
    b = np.array([0.5, -0.25, 1.0], np.float32)
    out = Q.fold_bias_i32(b, s_in=0.1, s_w=0.05, out_features=3)
    np.testing.assert_array_equal(out, np.round(b / 0.005).astype(np.int32))
    out = Q.fold_bias_i32(None, 0.1, 0.05, 4)
    np.testing.assert_array_equal(out, np.zeros(4, np.int32))


def test_requant_floor_matches_reference_formula(rng):
    # Oracle: x*mult, floor-div 2**shift, +zp, clamp
    # (reference scripts/export_model.py:132-135).
    acc = rng.integers(-(2**20), 2**20, size=(256,)).astype(np.int32)
    mult, shift, zp = 201, 14, 3
    expected = np.clip(
        np.floor_divide(acc.astype(np.int64) * mult, 2**shift) + zp, -128, 127
    ).astype(np.int8)
    got = Q.requant(jnp.asarray(acc), mult, shift, zp, rounding="floor")
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_requant_half_up(rng):
    acc = rng.integers(-(2**20), 2**20, size=(256,)).astype(np.int32)
    mult, shift = 113, 12
    expected = np.clip(
        np.floor_divide(acc.astype(np.int64) * mult + 2 ** (shift - 1), 2**shift),
        -128,
        127,
    ).astype(np.int8)
    got = Q.requant(jnp.asarray(acc), mult, shift, 0, rounding="half_up")
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_requant_zero_shift():
    acc = jnp.asarray([1, -1, 100], jnp.int32)
    got = Q.requant(acc, 1, 0, 0, rounding="half_up")
    np.testing.assert_array_equal(np.asarray(got), [1, -1, 100])


def test_requant_int_vs_float_within_1_lsb(rng):
    # The integer mult/shift path and the float-multiplier replay path
    # (reference tests/export_and_validation_W_B.py:120-151) agree to 1 LSB.
    acc = rng.integers(-(3 * 10**6), 3 * 10**6, size=(4096,)).astype(np.int32)
    for scale in [0.731e-3, 0.042, 0.517, 1.25e-2]:
        mult, shift = Q.calculate_hw_params(scale)
        qi = np.asarray(Q.requant(jnp.asarray(acc), mult, shift, 0))
        qf = np.asarray(Q.requant_f(jnp.asarray(acc), scale, 0))
        assert np.abs(qi.astype(np.int32) - qf.astype(np.int32)).max() <= 1
