"""Core int8 quantization math, bit-compatible with the reference flow.

The reference quantization contract (see SURVEY.md section 6):

- int8 per-tensor *symmetric* quantization, range [-128, 127], for both
  weights and activations (reference models/ITA/QAT/layers.py:10-21 uses
  torch FusedMovingAvgObsFakeQuantize + MovingAverageMinMaxObserver).
- Hardware requantization of an i32 accumulator uses an 8-bit multiplier
  and a right shift derived from the effective float scale via frexp
  (reference tests/export_and_validation_W_B.py:225-230).
- Biases fold to int32 as round(b / (s_in * s_w))
  (reference tests/export_and_validation_W_B.py:233-245).

Everything here is pure jnp (runs on TPU and CPU identically) except the
host-side parameter derivation helpers which use numpy scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

QMIN = -128
QMAX = 127
# torch per_tensor_symmetric divides the abs-max by (qmax - qmin) / 2.
_SYM_DIV = (QMAX - QMIN) / 2.0  # 127.5
_SCALE_EPS = 1e-8


# ---------------------------------------------------------------------------
# Scales and (de)quantization
# ---------------------------------------------------------------------------


def symmetric_scale(min_val: jax.Array, max_val: jax.Array) -> jax.Array:
    """Per-tensor symmetric scale from an observed (min, max) range.

    Matches torch's per_tensor_symmetric qparam computation:
    scale = max(|min|, |max|) / ((qmax - qmin) / 2), zero point fixed at 0.
    """
    amax = jnp.maximum(jnp.abs(min_val), jnp.abs(max_val))
    return jnp.maximum(amax / _SYM_DIV, _SCALE_EPS)


def quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    """float -> int8 with round-half-to-even (torch's nearbyint) + clamp."""
    q = jnp.clip(jnp.round(x / scale), QMIN, QMAX)
    return q.astype(jnp.int8)


def dequantize(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def fake_quant(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize-dequantize round trip (no gradient handling)."""
    return dequantize(quantize(x, scale), scale)


@jax.custom_vjp
def fake_quant_ste(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Fake quantization with the straight-through estimator.

    Gradient is passed through where x lies inside the representable range
    [QMIN*scale, QMAX*scale] and zeroed outside — the same STE with range
    clipping that torch's fake_quantize_per_tensor_affine backward applies.
    """
    return fake_quant(x, scale)


def _fake_quant_ste_fwd(x, scale):
    return fake_quant(x, scale), (x, scale)


def _fake_quant_ste_bwd(res, g):
    x, scale = res
    in_range = (x >= QMIN * scale) & (x <= QMAX * scale)
    return (jnp.where(in_range, g, 0.0), None)


fake_quant_ste.defvjp(_fake_quant_ste_fwd, _fake_quant_ste_bwd)


# ---------------------------------------------------------------------------
# Moving-average min/max observer (QAT)
# ---------------------------------------------------------------------------


@struct.dataclass
class ObserverState:
    """Running min/max statistics of one quantized tensor.

    Mirrors torch MovingAverageMinMaxObserver semantics: the first update
    takes the batch extrema directly, later updates apply an exponential
    moving average with ``averaging_const`` (torch default 0.01).
    """

    min_val: jax.Array  # f32 scalar
    max_val: jax.Array  # f32 scalar
    initialized: jax.Array  # bool scalar

    @classmethod
    def init(cls) -> "ObserverState":
        return cls(
            min_val=jnp.zeros((), jnp.float32),
            max_val=jnp.zeros((), jnp.float32),
            initialized=jnp.zeros((), jnp.bool_),
        )


def observe(
    state: ObserverState, x: jax.Array, averaging_const: float = 0.01
) -> ObserverState:
    """Update running min/max with a new batch of values."""
    bmin = jnp.min(x).astype(jnp.float32)
    bmax = jnp.max(x).astype(jnp.float32)
    new_min = jnp.where(
        state.initialized,
        state.min_val + averaging_const * (bmin - state.min_val),
        bmin,
    )
    new_max = jnp.where(
        state.initialized,
        state.max_val + averaging_const * (bmax - state.max_val),
        bmax,
    )
    return ObserverState(
        min_val=new_min, max_val=new_max, initialized=jnp.ones((), jnp.bool_)
    )


def observer_scale(state: ObserverState) -> jax.Array:
    return symmetric_scale(state.min_val, state.max_val)


# ---------------------------------------------------------------------------
# Hardware requantization parameters
# ---------------------------------------------------------------------------


def calculate_hw_params(effective_scale: float, bits: int = 8) -> tuple[int, int]:
    """Encode a float rescale factor as (multiplier, right-shift).

    effective_scale ~= multiplier / 2**shift with an 8-bit multiplier,
    derived exactly as the reference does
    (tests/export_and_validation_W_B.py:225-230): frexp the scale,
    multiplier = round(mantissa * 2**bits), shift = bits - exponent.
    """
    effective_scale = float(effective_scale)
    if effective_scale == 0.0:
        return 0, 0
    mantissa, exponent = np.frexp(effective_scale)
    multiplier = int(round(float(mantissa) * (2**bits)))
    shift = int(bits - exponent)
    return multiplier, shift


def hw_params_jnp(
    effective_scale: jax.Array, bits: int = 8
) -> tuple[jax.Array, jax.Array]:
    """Device-side (traceable) version of ``calculate_hw_params``.

    Identical frexp encoding, computed with jnp so QAT->int8 conversion
    can run as one jitted program with no host round-trip (host syncs are
    both un-idiomatic and, on some platforms, catastrophically slow).
    """
    eff = jnp.asarray(effective_scale, jnp.float32)
    mant, exp = jnp.frexp(eff)
    # float(2**bits): a Python-int 2**31 would overflow the weak-int32
    # argument parse; the f32 product mant * 2**bits is exact regardless
    # (pure exponent scaling of a 24-bit mantissa).
    mult = jnp.round(mant * float(2**bits)).astype(jnp.int32)
    shift = (bits - exp).astype(jnp.int32)
    zero = eff == 0
    return jnp.where(zero, 0, mult), jnp.where(zero, 0, shift)


def fold_bias_jnp(
    bias: jax.Array, s_in: jax.Array, s_w: jax.Array
) -> jax.Array:
    """Device-side int32 bias folding: round(b / (s_in * s_w))."""
    return jnp.round(bias / (s_in * s_w)).astype(jnp.int32)


def fold_bias_i32(
    bias: np.ndarray | jax.Array | None,
    s_in: float,
    s_w: float,
    out_features: int,
) -> np.ndarray:
    """Fold a float bias into the i32 accumulator domain.

    B_i32 = round(B_float / (s_in * s_w))
    (reference tests/export_and_validation_W_B.py:233-245).
    """
    if bias is None:
        return np.zeros((out_features,), np.int32)
    b = np.asarray(bias, np.float64)
    return np.round(b / (float(s_in) * float(s_w))).astype(np.int32)


def requant(
    acc: jax.Array,
    mult: jax.Array | int,
    shift: jax.Array | int,
    add: jax.Array | int = 0,
    rounding: str = "half_up",
) -> jax.Array:
    """Integer requantization of an i32 accumulator to int8.

    out = clamp( (acc * mult) >> shift  [+ 2**(shift-1) pre-shift if
    rounding='half_up'] + add, -128, 127 )

    rounding='floor' reproduces the reference's
    scripts/export_model.py:132-135 (mult, floor-div by 2**shift, +zp,
    clamp); 'half_up' is the ITA-hardware rounding variant (add half LSB
    before the arithmetic shift). All math stays in int32; exactness
    requires |acc * mult| < 2**31, which holds for every config in this
    framework (|acc| <= P*127*127 + |bias| ~ 3.2e6, mult <= 256).
    """
    acc = acc.astype(jnp.int32)
    mult = jnp.asarray(mult, jnp.int32)
    shift = jnp.asarray(shift, jnp.int32)
    add = jnp.asarray(add, jnp.int32)

    prod = acc * mult
    if rounding == "half_up":
        half = jnp.where(shift > 0, (1 << jnp.maximum(shift - 1, 0)), 0)
        prod = prod + half
    elif rounding != "floor":
        raise ValueError(f"unknown rounding mode {rounding!r}")
    # Arithmetic right shift == floor division by 2**shift for int32.
    shifted = prod >> jnp.clip(shift, 0, 31)
    return jnp.clip(shifted + add, QMIN, QMAX).astype(jnp.int8)


def requant_f(
    acc: jax.Array,
    effective_scale: jax.Array | float,
    zp: jax.Array | int = 0,
) -> jax.Array:
    """Float-multiplier requantization (round-half-even), int8 output.

    The float analog the reference uses in its verification replay
    (tests/export_and_validation_W_B.py:120-151). Used to cross-check the
    integer mult/shift path; agreement is within 1 LSB by construction.
    """
    y = jnp.round(acc.astype(jnp.float32) * effective_scale) + zp
    return jnp.clip(y, QMIN, QMAX).astype(jnp.int8)
