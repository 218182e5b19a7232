"""ITA's hardware integer-only softmax, bit-exact, in jnp.

Algorithm (reference models/ITA/QAT/ITA_softmax.py:29-77, and the ITA
paper arXiv:2307.03493): with B = 8 and eps_max = range_scale*B/2**B = 1.0,

    m       = max(x_int, axis)                    # per row
    shift   = floor((m - x_int) * eps_max + 0.5)  # int, == diff for eps_max=1
    exp     = 2**B >> shift                       # power-of-two "exp"
    denom   = max(sum(exp, axis), 1)
    inv     = floor((2**B - 1) * 2**16 / denom)
    out_u8  = floor(exp * inv / 2**16)            # uint8 result

The output is quantized with a *fixed* scale of 1/255 and zero point 0
(reference ITA_softmax.py:66-67), i.e. out_u8/255 approximates softmax(x).

Two entry points:

- ``ita_integer_softmax``: the real integer path (int32 in, uint8 out) —
  this is the golden model that replaces PyITA's softmax stage.
- ``ita_softmax_fakequant``: the QAT float path — simulates the logit
  quantization (dynamic per-tensor scale amax/127, reference
  ITA_softmax.py:41-46), runs the integer algorithm, dequantizes by 1/255,
  and backpropagates the *true float softmax* gradient as a surrogate
  (reference ITA_softmax.py:80-97) via jax.custom_vjp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_B = 8
_RANGE_SCALE = 32
_EPS_MAX = _RANGE_SCALE * _B / (2**_B)  # == 1.0
SOFTMAX_OUT_SCALE = 1.0 / 255.0
SOFTMAX_OUT_ZP = 0


def ita_integer_softmax(x_int: jax.Array, axis: int = -1) -> jax.Array:
    """Integer-only softmax over ``axis``; int logits in, uint8 out."""
    x_int = x_int.astype(jnp.int32)
    row_max = jnp.max(x_int, axis=axis, keepdims=True)
    diff = row_max - x_int  # >= 0
    shift = jnp.floor(diff.astype(jnp.float32) * _EPS_MAX + 0.5).astype(jnp.int32)
    # 2**B >> shift, with shifts beyond B saturating to 0 (python ints do
    # this naturally; bounded int32 shifts need explicit masking).
    exp_num = jnp.where(shift > _B, 0, (2**_B) >> jnp.minimum(shift, _B))
    denom = jnp.maximum(jnp.sum(exp_num, axis=axis, keepdims=True), 1)
    # Deliberate deviation from the torch reference: the reciprocal here is
    # EXACT integer floor division, while reference ITA_softmax.py:60
    # divides in float32 then floors — f32 rounding of (255*2^16)/denom can
    # cross an integer boundary and land 1 LSB high for some denominators.
    # The hardware's serial divider is exact, so exact integer division is
    # the bit-parity contract this framework targets; parity with the
    # torch float path is within 1 LSB.
    inv = ((2**_B - 1) * (2**16)) // denom  # floor division, fits in int32
    out = (exp_num * inv) >> 16  # floor(exp * inv / 2**16)
    return out.astype(jnp.uint8)


def _fakequant_forward(x: jax.Array, axis: int) -> jax.Array:
    # Simulate the quantization of incoming float logits with a dynamic
    # per-tensor scale (amax over the WHOLE tensor, reference
    # ITA_softmax.py:41-44 uses torch.amax with no dim).
    logit_scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
    x_int = jnp.round(x / logit_scale).astype(jnp.int32)
    out_u8 = ita_integer_softmax(x_int, axis=axis)
    return (out_u8.astype(jnp.float32) - SOFTMAX_OUT_ZP) * SOFTMAX_OUT_SCALE


@jax.custom_vjp
def _ita_softmax_fakequant_lastdim(x: jax.Array) -> jax.Array:
    return _fakequant_forward(x, axis=-1)


def _fq_fwd(x):
    return _fakequant_forward(x, axis=-1), x


def _fq_bwd(x, g):
    # Surrogate gradient: gradient of the exact float softmax at x
    # (reference ITA_softmax.py:80-97).
    s = jax.nn.softmax(x, axis=-1)
    dx = s * (g - jnp.sum(g * s, axis=-1, keepdims=True))
    return (dx,)


_ita_softmax_fakequant_lastdim.defvjp(_fq_fwd, _fq_bwd)


def ita_softmax_fakequant(x: jax.Array, axis: int = -1) -> jax.Array:
    """QAT-time integer softmax simulation with float-softmax surrogate grad."""
    if axis in (-1, x.ndim - 1):
        return _ita_softmax_fakequant_lastdim(x)
    x_moved = jnp.moveaxis(x, axis, -1)
    return jnp.moveaxis(_ita_softmax_fakequant_lastdim(x_moved), -1, axis)


def ita_partial_softmax(logits: jax.Array, k: int = 8) -> jax.Array:
    """Float emulation of ITA's *partial* softmax mode (top-k streaming).

    Reference scripts/export_model.py:26-36 (``ita_partial_max``): keep the
    top-k logits per row, zero the rest (NOT -inf — the reference's quirk,
    preserved), then take the float softmax. The hardware computes its
    softmax progressively over column tiles keeping a bounded partial
    state; this emulation is the reference's own stand-in for that mode.
    """
    seq = logits.shape[-1]
    k = min(k, seq)
    thresh = jax.lax.top_k(logits, k)[0][..., -1:]
    masked = jnp.where(logits >= thresh, logits, 0.0)
    return jax.nn.softmax(masked, axis=-1)
