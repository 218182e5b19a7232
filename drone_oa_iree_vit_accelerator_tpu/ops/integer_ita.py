"""Pure-jnp integer golden model of the ITA attention + FFN pipeline.

This module is the framework's replacement for ``PyITA`` — the
cycle-approximate golden simulator of the ITA accelerator that the
reference verifies against (usage: reference
tests/export_and_validation_W_B.py:518-555, interface documented in
SURVEY.md section 2.5). Every stage is named after its PyITA counterpart so
the stage-wise <= 1 LSB parity discipline carries over:

    Qp_requant, Kp_requant, Vp_requant   int8 Q/K/V projections
    A_requant                            int8 attention logits (QK^T)
    A_partial_softmax                    uint8 integer softmax
    O_soft_requant                       int8 context (A_sm @ V)
    Out_soft_requant                     int8 output projection
    FFp_requant, FF2p_requant            int8 FFN stages (ReLU between)

Integer semantics:

- matmuls accumulate in int32 (``preferred_element_type=jnp.int32`` — on
  TPU this runs on the MXU);
- int32 biases are pre-folded (ops.quant.fold_bias_i32);
- every stage requantizes with an 8-bit multiplier + right shift
  (ops.quant.requant, 'half_up' rounding — the ITA hardware behavior);
- the softmax is ops.ita_softmax.ita_integer_softmax (uint8 out, fixed
  scale 1/255, zero point 0);
- NO 1/sqrt(d) logit scaling, matching the reference architecture
  (reference models/ITA/layers.py:81-82 feeds QK^T straight to softmax —
  the scaling is absorbed by the learned requant scale).

Everything is jit-able and shape-static; the Pallas kernel
(ops/pallas/ita_kernel.py) must agree with this module bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .ita_softmax import ita_integer_softmax, ita_integer_softmax_streaming
from .quant import dequantize, quantize, requant


class RequantParams(NamedTuple):
    """One hardware requantization stage: (multiplier, shift, zero point)."""

    mult: int
    shift: int
    add: int = 0


@struct.dataclass
class QuantLinearParams:
    """An int8 linear layer with folded int32 bias and a requant stage.

    ``w`` is stored (in_features, out_features) — already transposed
    relative to torch's (out, in) layout so the jnp contraction is a plain
    x @ w on the MXU.
    """

    w: jax.Array  # int8 (in, out)
    b: jax.Array  # int32 (out,)
    mult: jax.Array  # int32 scalar
    shift: jax.Array  # int32 scalar
    add: jax.Array  # int32 scalar (output zero point; 0 for symmetric)
    # Float bookkeeping (not used by the integer path; kept for
    # conversion/inspection parity with the reference's extractor).
    s_in: jax.Array = struct.field(default=None)
    s_w: jax.Array = struct.field(default=None)
    s_out: jax.Array = struct.field(default=None)


@struct.dataclass
class IntAttentionParams:
    """Integer parameters of one ITA attention block (heads folded in P)."""

    q: QuantLinearParams
    k: QuantLinearParams
    v: QuantLinearParams
    o: QuantLinearParams
    qk_mult: jax.Array
    qk_shift: jax.Array
    qk_add: jax.Array
    av_mult: jax.Array
    av_shift: jax.Array
    av_add: jax.Array
    s_in: jax.Array  # input activation scale (float)
    s_out: jax.Array  # output activation scale (float)
    num_heads: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class IntFFNParams:
    """Integer parameters of one ITA FFN block (fc1 -> ReLU -> fc2)."""

    fc1: QuantLinearParams
    # ReLU requant bridges fc1's output scale to fc2's input scale
    # (reference tests/export_and_validation_W_B.py:278-301).
    relu_mult: jax.Array
    relu_shift: jax.Array
    relu_add: jax.Array
    fc2: QuantLinearParams
    s_in: jax.Array
    s_out: jax.Array


def int_linear(x_i8: jax.Array, p: QuantLinearParams) -> jax.Array:
    """int8 linear: i32 accumulate + bias + requant -> int8.

    Inputs may arrive i32-typed (requant results, int8-range by
    contract); XLA's i32 contraction lowering measured FASTER on the
    v5e than forcing the operands to int8 for these small-K shapes
    (0.974 vs 1.13 ms/call for the b1024 turbo XLA-encoder step), so no
    dtype normalization is done here."""
    acc = (
        jax.lax.dot_general(
            x_i8,
            p.w,
            (((x_i8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        + p.b
    )
    return requant(acc, p.mult, p.shift, p.add)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(S, P) -> (H, S, P/H)."""
    s, p = x.shape
    return x.reshape(s, num_heads, p // num_heads).transpose(1, 0, 2)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(H, S, P/H) -> (S, P)."""
    h, s, d = x.shape
    return x.transpose(1, 0, 2).reshape(s, h * d)


def ita_attention_int8(
    x_i8: jax.Array,
    p: IntAttentionParams,
    collect_stages: bool = False,
    softmax_mode: str = "onepass",
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """The full ITA integer attention pipeline on one sequence.

    x_i8: int8 (S, E) quantized input. Returns (int8 (S, E) output,
    stage dict named after PyITA result attributes).

    ``softmax_mode``: 'onepass' (global-max integer softmax, the torch QAT
    reference semantics) or 'streaming' (the hardware's partial softmax —
    PyITA's default, step4_QK(no_partial_softmax=False); reference
    tests/export_and_validation_W_B.py:527 verifies the two agree to
    MAE <= 1).
    """
    qp = int_linear(x_i8, p.q)  # (S, P)
    kp = int_linear(x_i8, p.k)
    vp = int_linear(x_i8, p.v)

    # NOTE on operand dtypes: presenting these contractions as int8
    # (values are int8-range, so the cast is bit-identical) was tried and
    # MEASURED SLOWER on the v5e than XLA's i32 lowering for these
    # shapes: b1024 turbo XLA-encoder step 1.13 ms (int8 operands) vs
    # 0.974 ms (i32 operands). The device-trace A/B lives in the round-3
    # log; keep i32 here. (The Pallas kernels do their own int8 MXU dots
    # and are unaffected either way.)
    qh = _split_heads(qp, p.num_heads).astype(jnp.int32)  # (H, S, d)
    kh = _split_heads(kp, p.num_heads).astype(jnp.int32)
    vh = _split_heads(vp, p.num_heads).astype(jnp.int32)

    # Attention logits: int8 x int8 -> i32, requant to int8. No 1/sqrt(d).
    logits = jax.lax.dot_general(
        qh,
        kh,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (H, S, S)
    a_i8 = requant(logits, p.qk_mult, p.qk_shift, p.qk_add)

    # Integer softmax: int8 logits -> uint8 probabilities (scale 1/255).
    if softmax_mode == "streaming":
        a_u8 = ita_integer_softmax_streaming(a_i8.astype(jnp.int32), axis=-1)
    elif softmax_mode == "onepass":
        a_u8 = ita_integer_softmax(a_i8.astype(jnp.int32), axis=-1)
    else:
        raise ValueError(f"unknown softmax mode {softmax_mode!r}")

    # Context: uint8 x int8 -> i32 (the mixed-sign matmul torch could not
    # do natively, reference tests/export_and_validation_W_B.py:120-151),
    # requant to int8. (i32 operands: see the dtype NOTE above.)
    ctx = jax.lax.dot_general(
        a_u8.astype(jnp.int32),
        vh,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (H, S, d)
    o_i8 = requant(ctx, p.av_mult, p.av_shift, p.av_add)

    out = int_linear(_merge_heads(o_i8), p.o)  # (S, E)

    stages: dict[str, jax.Array] = {}
    if collect_stages:
        stages = {
            "Qp_requant": qp,
            "Kp_requant": kp,
            "Vp_requant": vp,
            "A_requant": a_i8,
            "A_partial_softmax": a_u8,
            "O_soft_requant": _merge_heads(o_i8),
            "Out_soft_requant": out,
        }
    return out, stages


def ita_ffn_int8(
    x_i8: jax.Array, p: IntFFNParams, collect_stages: bool = False
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Integer FFN: fc1 -> requant -> ReLU (+requant) -> fc2 -> requant."""
    ff1 = int_linear(x_i8, p.fc1)  # (S, F)
    relu = jnp.maximum(ff1, 0)
    # Bridge fc1-out scale to fc2-in scale when their observers differ.
    relu = requant(
        relu.astype(jnp.int32), p.relu_mult, p.relu_shift, p.relu_add
    )
    ff2 = int_linear(relu, p.fc2)  # (S, E)

    stages: dict[str, jax.Array] = {}
    if collect_stages:
        stages = {"FFp_requant": relu, "FF2p_requant": ff2}
    return ff2, stages


@struct.dataclass
class VitflyIntAttentionParams:
    """Integer parameters of one vitfly ITA attention block — the true-
    integer analog of the reference's ``MultiheadITAWithRequant`` float
    emulation (reference scripts/export_model.py:119-162): Q projected
    from the full token sequence, K/V from the spatially REDUCED copy
    (cross-attention), per-stage requant (mq/sq, mk/sk, mv/sv, ma/sa,
    mav/sav, mo/so) plus the emulation's extra FINAL output requant
    (mf/sf, export_model.py:156-157). NO 1/sqrt(d) logit scaling — like
    the emulation, the learned requant scale absorbs it."""

    q: QuantLinearParams  # consumes the q input (scale s_q_in)
    k: QuantLinearParams  # consumes the kv input (scale s_kv_in)
    v: QuantLinearParams
    o: QuantLinearParams
    qk_mult: jax.Array
    qk_shift: jax.Array
    qk_add: jax.Array
    av_mult: jax.Array
    av_shift: jax.Array
    av_add: jax.Array
    final_mult: jax.Array  # mf/sf: out-proj scale -> block output scale
    final_shift: jax.Array
    final_add: jax.Array
    s_q_in: jax.Array
    s_kv_in: jax.Array
    s_out: jax.Array  # scale of the FINAL requant output
    num_heads: int = struct.field(pytree_node=False, default=1)


def vitfly_attention_int8(
    q_i8: jax.Array,   # int8 (Nq, C) quantized full tokens
    kv_i8: jax.Array,  # int8 (Nkv, C) quantized reduced tokens
    p: VitflyIntAttentionParams,
    collect_stages: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Integer vitfly (Mix-Transformer) attention: the full ITA pipeline
    with cross-attention K/V and the extra final requant.

    Softmax: the ONEPASS integer softmax. Nkv here is tiny (2 tokens in
    stage 1, 6 in stage 2 — far below ITA_N=16), so the hardware's
    16-column partial softmax degenerates to the full one; the
    reference's own emulation (``ita_partial_max``, top-8 of <= 6
    logits, export_model.py:26-36) likewise computes a full softmax.
    """
    qp = int_linear(q_i8, p.q)    # (Nq, C)
    kp = int_linear(kv_i8, p.k)   # (Nkv, C)
    vp = int_linear(kv_i8, p.v)

    qh = _split_heads(qp, p.num_heads).astype(jnp.int32)  # (H, Nq, d)
    kh = _split_heads(kp, p.num_heads).astype(jnp.int32)  # (H, Nkv, d)
    vh = _split_heads(vp, p.num_heads).astype(jnp.int32)

    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (H, Nq, Nkv); NO 1/sqrt(d)
    a_i8 = requant(logits, p.qk_mult, p.qk_shift, p.qk_add)
    a_u8 = ita_integer_softmax(a_i8.astype(jnp.int32), axis=-1)

    ctx = jax.lax.dot_general(
        a_u8.astype(jnp.int32), vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (H, Nq, d)
    o_i8 = requant(ctx, p.av_mult, p.av_shift, p.av_add)

    out = int_linear(_merge_heads(o_i8), p.o)  # (Nq, C) on s_o_out grid
    final = requant(
        out.astype(jnp.int32), p.final_mult, p.final_shift, p.final_add
    )

    stages: dict[str, jax.Array] = {}
    if collect_stages:
        stages = {
            "Qp_requant": qp,
            "Kp_requant": kp,
            "Vp_requant": vp,
            "A_requant": a_i8,
            "A_partial_softmax": a_u8,
            "O_soft_requant": _merge_heads(o_i8),
            "Out_soft_requant": out,
            "Final_requant": final,
        }
    return final, stages


def vitfly_attention_f32(
    x_q: jax.Array, x_kv: jax.Array, p: VitflyIntAttentionParams
) -> jax.Array:
    """Float-boundary wrapper for the vitfly integer attention: the
    Quant/DeQuant bracket around the accelerator region (the analog of
    ITASelfAttentionWrapper handing float tensors to
    MultiheadITAWithRequant, reference export_model.py:164-182)."""
    out, _ = vitfly_attention_int8(
        quantize(x_q, p.s_q_in), quantize(x_kv, p.s_kv_in), p
    )
    return dequantize(out, p.s_out)


def ita_attention_f32(
    x: jax.Array, p: IntAttentionParams, softmax_mode: str = "onepass"
) -> jax.Array:
    """Float-boundary wrapper: quantize -> integer attention -> dequantize.

    This is the QuantStub/DeQuantStub bracket of the reference's QAT model
    (models/ITA/QAT/layers.py:101-127) collapsed into the jit.
    """
    x_i8 = quantize(x, p.s_in)
    out, _ = ita_attention_int8(x_i8, p, softmax_mode=softmax_mode)
    return dequantize(out, p.s_out)


def ita_ffn_f32(x: jax.Array, p: IntFFNParams) -> jax.Array:
    """Float-boundary wrapper for the integer FFN."""
    x_i8 = quantize(x, p.s_in)
    out, _ = ita_ffn_int8(x_i8, p)
    return dequantize(out, p.s_out)
