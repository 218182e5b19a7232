"""Bit-exactness tests for the ITA integer softmax (ops/ita_softmax.py).

The oracle is a plain-Python/NumPy transliteration of the published ITA
softmax algorithm (arXiv:2307.03493; reference
models/ITA/QAT/ITA_softmax.py:29-77), written independently here.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.ops import ita_softmax as S


def numpy_ita_softmax(x_int: np.ndarray) -> np.ndarray:
    """Independent oracle, python-int semantics, last-axis softmax."""
    B = 8
    eps_max = 32 * B / 2**B  # 1.0
    x = x_int.astype(np.int64)
    out = np.zeros_like(x, dtype=np.uint8)
    flat = x.reshape(-1, x.shape[-1])
    oflat = out.reshape(-1, x.shape[-1])
    for r in range(flat.shape[0]):
        row = flat[r]
        m = row.max()
        shift = np.floor((m - row) * eps_max + 0.5).astype(np.int64)
        exp = np.array([(2**B) >> int(s) if s < 64 else 0 for s in shift])
        denom = max(int(exp.sum()), 1)
        inv = ((2**B - 1) * 2**16) // denom
        oflat[r] = np.floor(exp * inv / 2**16).astype(np.uint8)
    return out


def test_integer_softmax_bit_exact(rng):
    x = rng.integers(-128, 128, size=(4, 7, 128)).astype(np.int32)
    got = np.asarray(S.ita_integer_softmax(jnp.asarray(x)))
    np.testing.assert_array_equal(got, numpy_ita_softmax(x))


def test_integer_softmax_extremes():
    # All-equal logits -> uniform; extreme spread -> one-hot-ish.
    x = np.zeros((1, 128), np.int32)
    got = np.asarray(S.ita_integer_softmax(jnp.asarray(x)))
    np.testing.assert_array_equal(got, numpy_ita_softmax(x))
    x = np.full((1, 128), -128, np.int32)
    x[0, 17] = 127
    got = np.asarray(S.ita_integer_softmax(jnp.asarray(x)))
    np.testing.assert_array_equal(got, numpy_ita_softmax(x))
    assert got[0, 17] == 255


def test_integer_softmax_rows_approx_sum_to_one(rng):
    x = rng.integers(-64, 64, size=(16, 128)).astype(np.int32)
    got = np.asarray(S.ita_integer_softmax(jnp.asarray(x))).astype(np.int64)
    sums = got.sum(-1)
    # The fixed 1/255 output scale makes each row sum to ~255.
    assert np.all(np.abs(sums - 255) <= 128)


def test_fakequant_forward_matches_integer_path(rng):
    x = rng.normal(size=(2, 3, 128)).astype(np.float32) * 4
    scale = max(np.abs(x).max() / 127.0, 1e-8)
    x_int = np.round(x / scale).astype(np.int32)
    expected = numpy_ita_softmax(x_int).astype(np.float32) / 255.0
    got = np.asarray(S.ita_softmax_fakequant(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_fakequant_approximates_float_softmax(rng):
    x = rng.normal(size=(8, 128)).astype(np.float32) * 3
    got = np.asarray(S.ita_softmax_fakequant(jnp.asarray(x)))
    ref = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))
    # The power-of-two exp is a coarse proxy for float softmax; what must
    # hold: probability mass ~1 per row, argmax preserved, monotone-ish.
    assert np.abs(got.sum(-1) - 1.0).max() < 0.51
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_fakequant_surrogate_gradient_is_float_softmax_grad(rng):
    x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    _, vjp = jax.vjp(S.ita_softmax_fakequant, x)
    (dx,) = vjp(g)
    _, vjp_ref = jax.vjp(lambda v: jax.nn.softmax(v, axis=-1), x)
    (dx_ref,) = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-5)


def test_fakequant_other_axis(rng):
    x = rng.normal(size=(5, 128, 3)).astype(np.float32)
    got = np.asarray(S.ita_softmax_fakequant(jnp.asarray(x), axis=1))
    ref = np.asarray(
        S.ita_softmax_fakequant(jnp.asarray(np.moveaxis(x, 1, -1)))
    )
    np.testing.assert_allclose(got, np.moveaxis(ref, -1, 1), atol=1e-7)
