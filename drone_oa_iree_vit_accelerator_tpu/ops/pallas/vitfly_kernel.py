"""Fused Pallas kernel for the vitfly (upstream ITALSTM) attention block.

The reference's alt export path swaps every EfficientSelfAttention for
``MultiheadITAWithRequant`` — a float EMULATION of the ITA accelerator
region (reference scripts/export_model.py:119-162) wrapped so the K/V
spatial reduction stays float (ITASelfAttentionWrapper, :164-182). Here
that accelerator region runs as ONE Pallas kernel per block: quantize →
q/k/v projections → QKᵀ logits → integer softmax → AV → out-projection →
final requant → dequantize, all integer arithmetic bit-identical to the
golden path (ops/integer_ita.vitfly_attention_int8, which this kernel's
tests compare against bit-for-bit).

Why a kernel for such tiny matrices (Nq ≤ 345, Nkv ≤ 6, C ≤ 64): the
b1 int8 path through plain XLA ops measured SLOWER than f32 (123 vs
84 µs, docs/zoo_bench.json) — the cost is op-count overhead across ~30
small dispatches per block, not arithmetic. One launch per block
removes it, the same argument (and the same helpers) as the ITA
family's encoder kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integer_ita import VitflyIntAttentionParams
from .ita_kernel import (
    _int_dot,
    _integer_softmax_p8,
    _quantize,
    _requant,
)

# Packed i32 scalar layout for one vitfly attention block.
_Q_MULT, _Q_SHIFT = 0, 1
_K_MULT, _K_SHIFT = 2, 3
_V_MULT, _V_SHIFT = 4, 5
_QK_MULT, _QK_SHIFT = 6, 7
_AV_MULT, _AV_SHIFT = 8, 9
_O_MULT, _O_SHIFT = 10, 11
_F_MULT, _F_SHIFT = 12, 13
N_ISCALARS = 16  # two spare slots keep the layout lane-friendly

_FS_Q_IN, _FS_KV_IN, _FS_OUT = 0, 1, 2
N_FSCALARS = 4


def pack_vitfly_scalars(
    p: VitflyIntAttentionParams,
) -> tuple[jax.Array, jax.Array]:
    """Pack one block's requant params for SMEM prefetch. The add/zp
    slots are structurally zero for this family (quant/convert
    _quant_linear and convert_vitfly_attention both emit add=0)."""
    ints = jnp.stack(
        [
            p.q.mult, p.q.shift,
            p.k.mult, p.k.shift,
            p.v.mult, p.v.shift,
            p.qk_mult, p.qk_shift,
            p.av_mult, p.av_shift,
            p.o.mult, p.o.shift,
            p.final_mult, p.final_shift,
            jnp.int32(0), jnp.int32(0),
        ]
    ).astype(jnp.int32)[None, :]
    floats = jnp.stack(
        [p.s_q_in, p.s_kv_in, p.s_out, jnp.float32(0.0)]
    ).astype(jnp.float32)[None, :]
    return ints, floats


def _vitfly_attn_kernel(
    heads,  # static
    iscal_ref,  # SMEM (1, 16) i32
    fscal_ref,  # SMEM (1, 4) f32
    xq_ref,     # VMEM (1, Nq, C) f32
    xkv_ref,    # VMEM (1, Nkv, C) f32
    wq_ref, bq_ref,  # i8 (C, C) / i32 (1, C)
    wk_ref, bk_ref,
    wv_ref, bv_ref,
    wo_ref, bo_ref,
    out_ref,    # VMEM (1, Nq, C) f32
):
    i8, i32 = jnp.int8, jnp.int32
    xq = xq_ref[0].astype(jnp.float32)   # (Nq, C)
    xkv = xkv_ref[0].astype(jnp.float32)  # (Nkv, C)

    q_i8 = _quantize(xq, fscal_ref[0, _FS_Q_IN])
    kv_i8 = _quantize(xkv, fscal_ref[0, _FS_KV_IN])

    qp = _requant(
        _int_dot(q_i8, wq_ref[:]) + bq_ref[0],
        iscal_ref[0, _Q_MULT], iscal_ref[0, _Q_SHIFT],
    )
    kp = _requant(
        _int_dot(kv_i8, wk_ref[:]) + bk_ref[0],
        iscal_ref[0, _K_MULT], iscal_ref[0, _K_SHIFT],
    )
    vp = _requant(
        _int_dot(kv_i8, wv_ref[:]) + bv_ref[0],
        iscal_ref[0, _V_MULT], iscal_ref[0, _V_SHIFT],
    )

    c = qp.shape[1]
    d = c // heads
    parts = []
    for hd in range(heads):
        cols = slice(hd * d, (hd + 1) * d)
        # (Nq, d) x (Nkv, d)^T -> (Nq, Nkv); i32 accum; NO 1/sqrt(d).
        logits = jax.lax.dot_general(
            qp[:, cols].astype(i8), kp[:, cols].astype(i8),
            (((1,), (1,)), ((), ())), preferred_element_type=i32,
        )
        a_i8 = _requant(
            logits, iscal_ref[0, _QK_MULT], iscal_ref[0, _QK_SHIFT]
        )
        # Offset-packed int8 probabilities (probs - 128); the AV matmul
        # uses the exact decomposition a@v == p8@v + 128*colsum(v).
        p8 = _integer_softmax_p8(a_i8)
        v_h = vp[:, cols]  # (Nkv, d) i32 in int8 range
        av = jax.lax.dot_general(
            p8, v_h.astype(i8), (((1,), (0,)), ((), ())),
            preferred_element_type=i32,
        ) + 128 * jnp.sum(v_h, axis=0, keepdims=True)
        parts.append(
            _requant(av, iscal_ref[0, _AV_MULT], iscal_ref[0, _AV_SHIFT])
        )
    ctx = parts[0] if heads == 1 else jnp.concatenate(parts, axis=1)

    out = _requant(
        _int_dot(ctx.astype(i8), wo_ref[:]) + bo_ref[0],
        iscal_ref[0, _O_MULT], iscal_ref[0, _O_SHIFT],
    )
    # The emulation's extra FINAL requant (mf/sf, export_model.py:156-7).
    final = _requant(
        out, iscal_ref[0, _F_MULT], iscal_ref[0, _F_SHIFT]
    )
    out_ref[0] = final.astype(jnp.float32) * fscal_ref[0, _FS_OUT]


@functools.partial(jax.jit, static_argnames=("interpret",))
def vitfly_attention_block(
    x_q: jax.Array,   # (B, Nq, C) f32 full tokens
    x_kv: jax.Array,  # (B, Nkv, C) f32 reduced tokens
    p: VitflyIntAttentionParams,
    interpret: bool = False,
) -> jax.Array:
    """One fused vitfly ITA attention block on TPU (grid over B).

    Numerically identical to
    ``vmap(lambda a, b: vitfly_attention_f32(a, b, p))(x_q, x_kv)``
    (the golden integer path with its float quant/dequant bracket —
    the ITASelfAttentionWrapper boundary)."""
    b, nq, c = x_q.shape
    nkv = x_kv.shape[1]
    iscal, fscal = pack_vitfly_scalars(p)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def vmem_const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    row = lambda n: vmem_const((1, n))
    return pl.pallas_call(
        functools.partial(_vitfly_attn_kernel, p.num_heads),
        grid=(b,),
        in_specs=[
            smem((1, N_ISCALARS)),
            smem((1, N_FSCALARS)),
            pl.BlockSpec((1, nq, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem_const((c, c)), row(c),
            vmem_const((c, c)), row(c),
            vmem_const((c, c)), row(c),
            vmem_const((c, c)), row(c),
        ],
        out_specs=pl.BlockSpec(
            (1, nq, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nq, c), jnp.float32),
        interpret=interpret,
    )(
        iscal, fscal, x_q, x_kv,
        p.q.w, p.q.b[None, :],
        p.k.w, p.k.b[None, :],
        p.v.w, p.v.b[None, :],
        p.o.w, p.o.b[None, :],
    )
