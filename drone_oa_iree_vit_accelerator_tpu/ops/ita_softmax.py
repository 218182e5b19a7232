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
_INV_NUM = (2**_B - 1) * (2**16)  # 16711680, < 2**24


def _floor_div_inv(den: jax.Array) -> jax.Array:
    """Exact floor(16711680 / den), den >= 1 int32.

    f32 division + one integer fixup: the true quotient is < 2**24 and
    f32 round-to-nearest has relative error 2**-24, so the float quotient
    is within +-1 of the floor; the exact integer remainder corrects it.
    Much faster on the TPU VPU than XLA's generic i32 divide and exactly
    matches the oracle's integer division (tests/ita_oracle.py)."""
    q = jnp.floor(jnp.float32(_INV_NUM) / den.astype(jnp.float32)).astype(
        jnp.int32
    )
    r = _INV_NUM - q * den
    return q - (r < 0).astype(jnp.int32) + (r >= den).astype(jnp.int32)


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
    # torch float path is within 1 LSB. (_floor_div_inv is exact integer
    # division, implemented via corrected f32 for TPU speed.)
    inv = _floor_div_inv(denom)
    out = (exp_num * inv) >> 16  # floor(exp * inv / 2**16)
    return out.astype(jnp.uint8)


ITA_N = 16  # PE group width of the hardware's streaming softmax


def _exp2_shift_i32(diff: jax.Array) -> jax.Array:
    """2**B >> diff (int32, saturating to 0 beyond B); eps_max == 1.0 so the
    reference's floor(diff*eps_max + 0.5) is the identity on int diffs."""
    return jnp.where(diff > _B, 0, (2**_B) >> jnp.minimum(diff, _B))


def ita_integer_softmax_streaming(
    x_int: jax.Array, axis: int = -1, width: int = ITA_N
) -> jax.Array:
    """ITA's streaming ("partial") integer softmax — the hardware's default
    mode (PyITA step4_QK(no_partial_softmax=False) -> A_partial_softmax;
    the reference verifies against it, tests/export_and_validation_W_B.py:527).

    The row is consumed in ``width``-column groups with a running max and
    an accumulated denominator that is renormalized by a right shift
    whenever the max grows (ITA paper arXiv:2307.03493 section III). The
    shifts floor away low bits of earlier groups' contributions, so the
    result differs from ``ita_integer_softmax`` by a bounded amount
    (exactly 0 whenever the global max lies in the first group).

    The group recurrence is sequential by definition; with S=128 and
    width=16 it is 8 cheap unrolled steps on (..., 1) slices — everything
    else is vectorized. Bit-exact vs tests/ita_oracle.ita_partial_softmax.
    """
    if axis not in (-1, x_int.ndim - 1):
        x_moved = jnp.moveaxis(x_int, axis, -1)
        return jnp.moveaxis(
            ita_integer_softmax_streaming(x_moved, -1, width), -1, axis
        )
    x = x_int.astype(jnp.int32)
    n = x.shape[-1]
    if n % width != 0:
        raise ValueError(f"sequence length {n} not a multiple of {width}")
    groups = n // width

    cur_max = None
    cur_sum = None
    for g in range(groups):
        grp = x[..., g * width : (g + 1) * width]
        gmax = jnp.max(grp, axis=-1)
        if cur_max is None:
            cur_max, cur_sum = gmax, jnp.zeros_like(gmax)
        else:
            new_max = jnp.maximum(cur_max, gmax)
            # Renormalize the accumulated sum to the new max. The sum is
            # <= n * 2**B = 2**15, so clipping the shift at 31 is exact.
            cur_sum = cur_sum >> jnp.minimum(new_max - cur_max, 31)
            cur_max = new_max
        cur_sum = cur_sum + jnp.sum(
            _exp2_shift_i32(cur_max[..., None] - grp), axis=-1
        )

    denom = jnp.maximum(cur_sum, 1)[..., None]
    inv = _floor_div_inv(denom)
    exp_num = _exp2_shift_i32(cur_max[..., None] - x)
    return ((exp_num * inv) >> 16).astype(jnp.uint8)


def _fakequant_forward(x: jax.Array, axis: int, mode: str) -> jax.Array:
    # Simulate the quantization of incoming float logits with a dynamic
    # per-tensor scale (amax over the WHOLE tensor, reference
    # ITA_softmax.py:41-44 uses torch.amax with no dim).
    logit_scale = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
    x_int = jnp.round(x / logit_scale).astype(jnp.int32)
    if mode == "streaming":
        out_u8 = ita_integer_softmax_streaming(x_int, axis=axis)
    else:
        out_u8 = ita_integer_softmax(x_int, axis=axis)
    return (out_u8.astype(jnp.float32) - SOFTMAX_OUT_ZP) * SOFTMAX_OUT_SCALE


def _fq_bwd(x, g):
    # Surrogate gradient: gradient of the exact float softmax at x
    # (reference ITA_softmax.py:80-97) — same surrogate for both integer
    # modes (the hardware mode only changes the forward approximation).
    s = jax.nn.softmax(x, axis=-1)
    dx = s * (g - jnp.sum(g * s, axis=-1, keepdims=True))
    return (dx,)


@jax.custom_vjp
def _ita_softmax_fakequant_lastdim(x: jax.Array) -> jax.Array:
    return _fakequant_forward(x, axis=-1, mode="onepass")


_ita_softmax_fakequant_lastdim.defvjp(
    lambda x: (_fakequant_forward(x, -1, "onepass"), x), _fq_bwd
)


@jax.custom_vjp
def _ita_softmax_fakequant_lastdim_streaming(x: jax.Array) -> jax.Array:
    return _fakequant_forward(x, axis=-1, mode="streaming")


_ita_softmax_fakequant_lastdim_streaming.defvjp(
    lambda x: (_fakequant_forward(x, -1, "streaming"), x), _fq_bwd
)


def ita_softmax_fakequant(
    x: jax.Array, axis: int = -1, mode: str = "onepass"
) -> jax.Array:
    """QAT-time integer softmax simulation with float-softmax surrogate grad.

    mode='onepass' simulates the global-max softmax (the torch QAT
    reference); mode='streaming' simulates the hardware's partial softmax.
    """
    if mode == "streaming":
        fn = _ita_softmax_fakequant_lastdim_streaming
    elif mode == "onepass":
        fn = _ita_softmax_fakequant_lastdim
    else:
        raise ValueError(f"unknown softmax mode {mode!r}")
    if axis in (-1, x.ndim - 1):
        return fn(x)
    x_moved = jnp.moveaxis(x, axis, -1)
    return jnp.moveaxis(fn(x_moved), -1, axis)


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
