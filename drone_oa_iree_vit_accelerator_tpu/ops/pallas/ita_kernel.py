"""Fused Pallas TPU kernel: one ITA encoder layer, bit-exact int8.

This kernel is the TPU-native replacement for the reference's FPGA
accelerator offload (SURVEY.md section 2.2: ITA_dispatch.c + ITA_spec.mlir +
the ITA RTL): the entire quantized encoder layer —

    quantize(s_attn_in)
      -> int8 Q/K/V projections (MXU, i32 accum) -> requant
      -> QK^T (no 1/sqrt(d)) -> requant -> integer softmax (uint8)
      -> AV -> requant -> out-projection -> requant
    -> dequant, residual add, LayerNorm (f32, VPU)
    quantize(s_ffn_in)
      -> int8 fc1 -> requant -> ReLU -> requant bridge
      -> int8 fc2 -> requant
    -> dequant, residual add, LayerNorm

— runs as ONE pallas_call with every intermediate resident in VMEM
(S=128, E=64, P=192, F=256 total well under 1 MB), eliminating the
HBM round-trips between the ~15 XLA ops it replaces.

Bit-exactness contract: identical output to the pure-jnp golden model
(ops/integer_ita.py + models/layers.layer_norm composition) — enforced by
tests/test_pallas_kernel.py in interpret mode and by the on-TPU
verification drive. The integer softmax reciprocal uses restoring long
division (Mosaic's i32 floor-division path is avoided) so the uint8
probabilities match ops/ita_softmax.ita_integer_softmax exactly.

Scalar requant parameters arrive via SMEM as a packed (1, 20) i32 array
and the four float scales as (1, 4) f32 (see pack_block_scalars).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..integer_ita import IntAttentionParams, IntFFNParams

# Packed i32 scalar layout (indices into the (1, 20) SMEM array).
_IQ_MULT, _IQ_SHIFT = 0, 1
_IK_MULT, _IK_SHIFT = 2, 3
_IV_MULT, _IV_SHIFT = 4, 5
_IQK_MULT, _IQK_SHIFT = 6, 7
_IAV_MULT, _IAV_SHIFT = 8, 9
_IO_MULT, _IO_SHIFT = 10, 11
_IFC1_MULT, _IFC1_SHIFT = 12, 13
_IRELU_MULT, _IRELU_SHIFT = 14, 15
_IFC2_MULT, _IFC2_SHIFT = 16, 17
N_ISCALARS = 20  # two spare slots keep the layout lane-friendly

# Packed f32 scalar layout.
_FS_ATTN_IN, _FS_ATTN_OUT, _FS_FFN_IN, _FS_FFN_OUT = 0, 1, 2, 3
N_FSCALARS = 4

_SOFTMAX_NUM = (2**8 - 1) * (2**16)  # 16711680, fits 25 bits


def pack_block_scalars(
    attn: IntAttentionParams, ffn: IntFFNParams
) -> tuple[jax.Array, jax.Array]:
    """Pack one encoder layer's requant params for SMEM prefetch."""
    ints = jnp.stack(
        [
            attn.q.mult, attn.q.shift,
            attn.k.mult, attn.k.shift,
            attn.v.mult, attn.v.shift,
            attn.qk_mult, attn.qk_shift,
            attn.av_mult, attn.av_shift,
            attn.o.mult, attn.o.shift,
            ffn.fc1.mult, ffn.fc1.shift,
            ffn.relu_mult, ffn.relu_shift,
            ffn.fc2.mult, ffn.fc2.shift,
            jnp.int32(0), jnp.int32(0),
        ]
    ).astype(jnp.int32)[None, :]
    floats = jnp.stack(
        [attn.s_in, attn.s_out, ffn.s_in, ffn.s_out]
    ).astype(jnp.float32)[None, :]
    return ints, floats


def _requant(acc, mult, shift):
    """clamp(floor((acc*mult + 2**(shift-1)) / 2**shift), -128, 127) — the
    half-up variant matching ops.quant.requant (zero zp, symmetric)."""
    half = jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0)
    out = (acc * mult + half) >> jnp.clip(shift, 0, 31)
    return jnp.clip(out, -128, 127)


def _requant_half(shift):
    """The half-up rounding constant of _requant (scalar i32)."""
    return jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0)


def _requant_folded(dot, cvec, mult, shift):
    """_requant(dot + b, mult, shift) with the bias pre-folded:
    cvec = b*mult + half. Bit-identical ((dot+b)*m + h == dot*m +
    (b*m+h) in i32; |acc*mult| < 2**31 holds for every config here, so
    neither summand overflows) — one fewer full-width VPU pass per
    requant stage, which matters because the batched kernel is
    VPU-bound (requant chains over (nb*S, P)-sized accumulators)."""
    out = (dot * mult + cvec) >> jnp.clip(shift, 0, 31)
    return jnp.clip(out, -128, 127)


def _requant_folded_i8(dot, cvec, mult, shift):
    """_requant_folded emitting int8 directly — for stages whose only
    consumer is an int8 MXU operand. Values are clipped to [-128, 127]
    before the cast, so the narrowing is exact; emitting i8 in the same
    sweep (instead of a separate .astype(i8) pass over the i32 result)
    removes one full-width VPU pass + 3/4 of the write bandwidth per
    stage on the VPU-bound batched kernel."""
    out = (dot * mult + cvec) >> jnp.clip(shift, 0, 31)
    return jnp.clip(out, -128, 127).astype(jnp.int8)


def _quantize(x, scale):
    return jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)


def _floor_div_u25(num: int, den: jax.Array) -> jax.Array:
    """Exact floor(num / den) for a constant 25-bit numerator (den >= 1).

    One f32 division + one integer fixup step. Exact because the true
    quotient is < 2**24 and f32 round-to-nearest division has relative
    error 2**-24, so |float quotient - true| < 1 — a single +-1
    correction from the exact integer remainder recovers the floor.
    (Replaces a 25-step restoring long division: 175 VPU ops on a
    lane-starved (S, 1) layout dominated the kernel's softmax cost.)
    """
    q = jnp.floor(jnp.float32(num) / den.astype(jnp.float32)).astype(jnp.int32)
    r = num - q * den
    return q - (r < 0).astype(jnp.int32) + (r >= den).astype(jnp.int32)


def _integer_softmax(a_i32: jax.Array) -> jax.Array:
    """ITA integer softmax on (S, S) int32 logits -> int32 in [0, 255].

    Mirrors ops/ita_softmax.ita_integer_softmax bit-for-bit (eps_max = 1.0
    so the exp shift equals the max-diff directly; see that module's
    docstring for the algorithm derivation)."""
    row_max = jnp.max(a_i32, axis=-1, keepdims=True)
    diff = row_max - a_i32
    # eps_max = 1.0 => the exp shift IS the integer max-diff:
    # floor(d*1.0 + 0.5) == d for integer d >= 0, and 256 >> s == 0 for
    # every s in [9, 31], so the reference's where(shift > 8, 0, ...)
    # guard collapses into the clamped shift. Exact (bit-identical) and
    # 6 fewer VPU passes over the (rows, S) logits — the kernel is
    # VPU-bound at batch (726 us/call measured before this).
    exp = 256 >> jnp.minimum(diff, 31)
    denom = jnp.maximum(jnp.sum(exp, axis=-1, keepdims=True), 1)
    inv = _floor_div_u25(_SOFTMAX_NUM, denom)
    return (exp * inv) >> 16  # uint8 range, kept i32 for the AV matmul


def _integer_softmax_p8(a_i32: jax.Array) -> jax.Array:
    """_integer_softmax emitting the AV matmul's offset-packed int8
    operand directly: p8 = probs - 128 with probs in [0, 255], so the
    subtraction and the i8 narrowing fuse into the softmax's final sweep
    instead of costing a separate full-width pass over the (rows, S)
    probability matrix (the batched kernel's largest intermediate).
    Bit-identical to (_integer_softmax(a) - 128).astype(int8)."""
    row_max = jnp.max(a_i32, axis=-1, keepdims=True)
    diff = row_max - a_i32
    exp = 256 >> jnp.minimum(diff, 31)
    denom = jnp.maximum(jnp.sum(exp, axis=-1, keepdims=True), 1)
    inv = _floor_div_u25(_SOFTMAX_NUM, denom)
    return (((exp * inv) >> 16) - 128).astype(jnp.int8)


def _integer_softmax_streaming_p8(
    a_i32: jax.Array, width: int = 16
) -> jax.Array:
    """Offset-packed int8 variant of the streaming softmax (see
    _integer_softmax_p8)."""
    return (
        _integer_softmax_streaming(a_i32, width) - 128
    ).astype(jnp.int8)


def _integer_softmax_T_p8(aT_i32: jax.Array) -> jax.Array:
    """Onepass integer softmax on TRANSPOSED logits (keys on sublanes):
    reductions run over axis 0 and the per-query stats live in (1, L)
    rows. Bit-identical to _integer_softmax, transposed, offset-packed
    int8 output (see _integer_softmax_p8)."""
    col_max = jnp.max(aT_i32, axis=0, keepdims=True)
    diff = col_max - aT_i32
    exp = 256 >> jnp.minimum(diff, 31)
    denom = jnp.maximum(jnp.sum(exp, axis=0, keepdims=True), 1)
    inv = _floor_div_u25(_SOFTMAX_NUM, denom)
    return (((exp * inv) >> 16) - 128).astype(jnp.int8)


def _integer_softmax_streaming_T_p8(
    aT_i32: jax.Array, width: int = 16
) -> jax.Array:
    """Streaming softmax on TRANSPOSED logits — the throughput layout.

    The row-major streaming scan slices (rows, 16) column groups, which
    runs the whole 8-step loop at 16/128 lane occupancy (measured:
    5.4 ms of a 6.2 ms b1024 turbo call — 7x the onepass softmax's
    cost). With keys on the SUBLANE axis (aT[j, q] = logits[q, j],
    obtained for free by computing K @ Q^T instead of Q @ K^T), each
    group step slices (16, L) ROW blocks: full 128-lane width, and the
    running max / renormalized sum live in (1, L) rows. Identical
    integer ops per element as _integer_softmax_streaming (the oracle's
    PyITA semantics), just transposed; returns the offset-packed int8
    operand for the dim-0-contracting AV matmul.

    Dependency-restructured for ILP (round 5): the naive scan serializes
    every (16, L) group step behind the previous step's running max. The
    recurrence only needs the PREFIX maxes, which cost 8 cheap (1, L)
    row ops — so the group maxes and the per-group partial sums (the
    full-width work) are hoisted into independent passes and only the
    (1, L) accumulator recurrence stays serial. Bit-exact vs the naive
    scan: identical integer expressions per element (the per-group sum
    uses its prefix max exactly as the scan's cur_max did; the
    accumulator shift composes the same jnp.minimum(.., 31)-clamped
    amounts), just reordered across independent values."""
    s = aT_i32.shape[0]
    n_groups = s // width
    grps = [aT_i32[g * width : (g + 1) * width, :] for g in range(n_groups)]
    gmax = [jnp.max(g, axis=0, keepdims=True) for g in grps]   # (1, L) each
    pmax = [gmax[0]]                                  # scan's cur_max trace
    for g in range(1, n_groups):
        pmax.append(jnp.maximum(pmax[-1], gmax[g]))
    psum = [
        jnp.sum(
            256 >> jnp.minimum(pmax[g] - grps[g], 31), axis=0, keepdims=True
        )
        for g in range(n_groups)
    ]
    cur_sum = psum[0]
    for g in range(1, n_groups):
        cur_sum = (
            cur_sum >> jnp.minimum(pmax[g] - pmax[g - 1], 31)
        ) + psum[g]
    denom = jnp.maximum(cur_sum, 1)
    inv = _floor_div_u25(_SOFTMAX_NUM, denom)            # (1, L)
    diff = pmax[-1] - aT_i32
    exp = 256 >> jnp.minimum(diff, 31)
    return (((exp * inv) >> 16) - 128).astype(jnp.int8)  # (S, L) i8


def _integer_softmax_streaming(a_i32: jax.Array, width: int = 16) -> jax.Array:
    """ITA streaming (partial) softmax — the hardware's default mode.

    Mirrors ops/ita_softmax.ita_integer_softmax_streaming bit-for-bit:
    the denominator is accumulated over ITA_N=16-column groups with a
    running max, renormalized by >> whenever the max grows; numerators
    use the final global max. 8 unrolled group steps on (S, 1) slices."""
    n = a_i32.shape[-1]
    cur_max = None
    cur_sum = None
    for g in range(n // width):
        grp = a_i32[:, g * width : (g + 1) * width]
        gmax = jnp.max(grp, axis=-1, keepdims=True)
        if cur_max is None:
            cur_max, cur_sum = gmax, jnp.zeros_like(gmax)
        else:
            new_max = jnp.maximum(cur_max, gmax)
            cur_sum = cur_sum >> jnp.minimum(new_max - cur_max, 31)
            cur_max = new_max
        d = cur_max - grp
        # 256 >> s == 0 for s in [9, 31]: the where(d > 8, 0, ...) guard
        # collapses into the clamped shift (see _integer_softmax).
        cur_sum = cur_sum + jnp.sum(
            256 >> jnp.minimum(d, 31), axis=-1, keepdims=True
        )
    denom = jnp.maximum(cur_sum, 1)
    inv = _floor_div_u25(_SOFTMAX_NUM, denom)
    diff = cur_max - a_i32
    exp = 256 >> jnp.minimum(diff, 31)
    return (exp * inv) >> 16


def _int_dot(a, b):
    """int8 x int8 (or u8-range i32 x int8) matmul with i32 accumulation
    on the MXU."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _layer_norm(x, g, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def encoder_core(
    x,             # (nb*S, E) f32 value
    softmax_mode,  # static: 'onepass' | 'streaming'
    nb,            # static: sequences folded into the row axis
    seq,           # static: sequence length S
    iscal_ref,  # SMEM (1, 20) i32
    fscal_ref,  # SMEM (1, 4) f32
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,  # i8 (E,P) / i32 (1,P)
    wo_ref, bo_ref,                                   # i8 (P,E) / i32 (1,E)
    w1_ref, b1_ref, w2_ref, b2_ref,                   # i8 (E,F),(F,E) / i32
    ln1_g_ref, ln1_b_ref, ln2_g_ref, ln2_b_ref,       # f32 (1,E)
    heads: int = 1,  # static: attention heads (P split column-wise)
):
    """One quantized encoder layer on an (nb*S, E) f32 value; returns the
    (nb*S, E) f32 output. Shared by the standalone encoder-block kernel
    and the whole-model megakernel (model_kernel.py) — the weight/scalar
    refs have identical layouts in both.

    ``heads``: H>1 splits the P projection columns into H independent
    d=P/H attention heads (golden analog: integer_ita._split_heads) —
    static unrolled, P=192 divides into MXU-friendly d in {192,96,64}."""
    # ---- quantized attention region ----
    s_attn_in = fscal_ref[0, _FS_ATTN_IN]
    x_i8 = _quantize(x, s_attn_in)

    qp = _requant(
        _int_dot(x_i8, wq_ref[:]) + bq_ref[0],
        iscal_ref[0, _IQ_MULT], iscal_ref[0, _IQ_SHIFT],
    )
    kp = _requant(
        _int_dot(x_i8, wk_ref[:]) + bk_ref[0],
        iscal_ref[0, _IK_MULT], iscal_ref[0, _IK_SHIFT],
    )
    vp = _requant(
        _int_dot(x_i8, wv_ref[:]) + bv_ref[0],
        iscal_ref[0, _IV_MULT], iscal_ref[0, _IV_SHIFT],
    )

    # Attention is per-sequence and per-head: logits (S,S), integer
    # softmax, AV — both loops static-unrolled (nb <= 8, heads <= 3).
    # TRANSPOSED layout (same as encoder_core_batched): K @ Q^T puts the
    # softmax reduction axis (keys) on SUBLANES — for the streaming mode
    # this turns the 8-step (S, 16) column-group scan into full-lane-
    # width row blocks; bit-identical probabilities either way.
    d = qp.shape[1] // heads
    ctx_parts = []
    for i in range(nb):
        qp_i = qp[i * seq : (i + 1) * seq].astype(jnp.int8)   # (S, P)
        kp_i = kp[i * seq : (i + 1) * seq].astype(jnp.int8)
        vp_i = vp[i * seq : (i + 1) * seq]
        head_parts = []
        for hd in range(heads):
            cols = slice(hd * d, (hd + 1) * d)
            # Transposed logits: (S_keys, S_q); i32 accum; NO 1/sqrt(d).
            logitsT = jax.lax.dot_general(
                kp_i[:, cols], qp_i[:, cols], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            aT_i8 = _requant(
                logitsT, iscal_ref[0, _IQK_MULT], iscal_ref[0, _IQK_SHIFT]
            )
            # The uint8 probabilities don't fit int8 and Mosaic has no
            # mixed u8/i32 x i8 MXU path; the softmax emits the exact
            # offset decomposition's i8 operand directly:
            # a @ v == (a - 128) @ v + 128 * colsum(v).
            if softmax_mode == "streaming":
                p8T = _integer_softmax_streaming_T_p8(aT_i8)
            else:
                p8T = _integer_softmax_T_p8(aT_i8)
            v_h = vp_i[:, cols]
            av_acc = jax.lax.dot_general(
                p8T, v_h.astype(jnp.int8), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + 128 * jnp.sum(v_h, axis=0, keepdims=True)
            head_parts.append(
                _requant(
                    av_acc, iscal_ref[0, _IAV_MULT], iscal_ref[0, _IAV_SHIFT]
                )
            )
        ctx_parts.append(
            head_parts[0] if heads == 1
            else jnp.concatenate(head_parts, axis=1)
        )
    ctx = ctx_parts[0] if nb == 1 else jnp.concatenate(ctx_parts, axis=0)

    attn_out_i8 = _requant(
        _int_dot(ctx.astype(jnp.int8), wo_ref[:]) + bo_ref[0],
        iscal_ref[0, _IO_MULT], iscal_ref[0, _IO_SHIFT],
    )

    # ---- float glue: dequant, residual, LN (VPU) ----
    attn_f = attn_out_i8.astype(jnp.float32) * fscal_ref[0, _FS_ATTN_OUT]
    h = _layer_norm(x + attn_f, ln1_g_ref[0], ln1_b_ref[0])

    # ---- quantized FFN region ----
    h_i8 = _quantize(h, fscal_ref[0, _FS_FFN_IN])
    ff1 = _requant(
        _int_dot(h_i8, w1_ref[:]) + b1_ref[0],
        iscal_ref[0, _IFC1_MULT], iscal_ref[0, _IFC1_SHIFT],
    )
    relu = _requant(
        jnp.maximum(ff1, 0),
        iscal_ref[0, _IRELU_MULT], iscal_ref[0, _IRELU_SHIFT],
    )
    ff2 = _requant(
        _int_dot(relu.astype(jnp.int8), w2_ref[:]) + b2_ref[0],
        iscal_ref[0, _IFC2_MULT], iscal_ref[0, _IFC2_SHIFT],
    )

    ffn_f = ff2.astype(jnp.float32) * fscal_ref[0, _FS_FFN_OUT]
    return _layer_norm(h + ffn_f, ln2_g_ref[0], ln2_b_ref[0])


def encoder_core_batched(
    x,             # (nb*S, E) f32 value
    softmax_mode,  # static: 'onepass' | 'streaming'
    nb,            # static: sequences folded into the row axis
    seq,           # static: sequence length S
    iscal_ref, fscal_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln1_g_ref, ln1_b_ref, ln2_g_ref, ln2_b_ref,
    heads: int = 1,
):
    """Throughput variant of encoder_core: identical integer arithmetic
    (same requant/softmax helpers), restructured so every stage runs
    BATCHED across the nb folded sequences instead of an 8-way serial
    python loop —

    - requant + integer softmax run ONCE on the stacked (nb*S, S)
      logits (full VPU lanes, one floor-division pass instead of nb
      lane-starved ones);
    - only the inherently per-sequence (S,P)x(P,S) MXU dots stay in the
      unrolled loop. (A true batch-dim dot_general was tried first and
      aborts Mosaic's ApplyVectorLayout pass: vector_extract_rule
      "limits[i] <= dim(i)" — batch the VPU, loop the MXU.)

    Bit-exactness: same ops, same order per element; the pallas-vs-golden
    tests cover this path via ita_encoder_block(batched_core=True).
    """
    i8 = jnp.int8
    s_attn_in = fscal_ref[0, _FS_ATTN_IN]
    x_i8 = _quantize(x, s_attn_in)

    # Folded requant constants (one (1, N) row each — negligible next to
    # the (nb*S, N) activation passes they save; see _requant_folded).
    m_q, s_q = iscal_ref[0, _IQ_MULT], iscal_ref[0, _IQ_SHIFT]
    m_k, s_k = iscal_ref[0, _IK_MULT], iscal_ref[0, _IK_SHIFT]
    m_v, s_v = iscal_ref[0, _IV_MULT], iscal_ref[0, _IV_SHIFT]
    m_o, s_o = iscal_ref[0, _IO_MULT], iscal_ref[0, _IO_SHIFT]
    m_1, s_1 = iscal_ref[0, _IFC1_MULT], iscal_ref[0, _IFC1_SHIFT]
    m_2, s_2 = iscal_ref[0, _IFC2_MULT], iscal_ref[0, _IFC2_SHIFT]

    # Projection requants emit i8 in-sweep (_requant_folded_i8): their
    # only consumers are int8 MXU operands, and the separate widening
    # .astype(i8) passes were measurable on the VPU-bound batched path.
    qp8 = _requant_folded_i8(
        _int_dot(x_i8, wq_ref[:]), bq_ref[0] * m_q + _requant_half(s_q),
        m_q, s_q,
    )
    kp8 = _requant_folded_i8(
        _int_dot(x_i8, wk_ref[:]), bk_ref[0] * m_k + _requant_half(s_k),
        m_k, s_k,
    )
    vp8 = _requant_folded_i8(
        _int_dot(x_i8, wv_ref[:]), bv_ref[0] * m_v + _requant_half(s_v),
        m_v, s_v,
    )
    d = qp8.shape[1] // heads
    hslices = [slice(hd * d, (hd + 1) * d) for hd in range(heads)]
    # Transposed-logits layout for BOTH modes: compute K @ Q^T (free —
    # same MXU dot with swapped operands), run the softmax with the keys
    # on SUBLANES, and contract the AV matmul on dim 0. Bit-identical
    # probabilities. For streaming this is the difference between a
    # 16/128-lane group scan and full-width row blocks (measured 6.20 ->
    # 0.95 ms/call b1024); onepass gains the same cheap sublane
    # reductions (measured 0.977 -> see docs/softmax_mode_report.json).
    logitT_parts = [
        jax.lax.dot_general(
            kp8[i * seq : (i + 1) * seq, cols],
            qp8[i * seq : (i + 1) * seq, cols],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
        )  # (S_keys, S_q); NO 1/sqrt(d)
        for i in range(nb)
        for cols in hslices
    ]
    logitsT = (
        logitT_parts[0] if len(logitT_parts) == 1
        else jnp.concatenate(logitT_parts, axis=1)
    )  # (S, nb*heads*S)
    aT_i8 = _requant(
        logitsT, iscal_ref[0, _IQK_MULT], iscal_ref[0, _IQK_SHIFT]
    )
    if softmax_mode == "streaming":
        p8T = _integer_softmax_streaming_T_p8(aT_i8)
    else:
        p8T = _integer_softmax_T_p8(aT_i8)

    def _attn_dot(i, hd, v_h):
        cols2 = slice((i * heads + hd) * seq, (i * heads + hd + 1) * seq)
        return jax.lax.dot_general(
            p8T[:, cols2], v_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # AV with the exact offset decomposition (see encoder_core); the
    # per-sequence 128*colsum(v) compensation folds into the requant
    # constant row ((K*m + half) — exact in i32, same bound argument).
    m_av, s_av = iscal_ref[0, _IAV_MULT], iscal_ref[0, _IAV_SHIFT]
    half_av = _requant_half(s_av)

    def _ctx_block(i):
        """Context rows for sequence i: per-head AV, heads on columns."""
        parts = []
        for hd, cols in enumerate(hslices):
            v_h = vp8[i * seq : (i + 1) * seq, cols]
            parts.append(
                _requant_folded_i8(
                    _attn_dot(i, hd, v_h),
                    # colsum accumulates the i8 slice in i32 — exact,
                    # max |sum| = S*127 << 2**31.
                    128 * jnp.sum(
                        v_h.astype(jnp.int32), axis=0, keepdims=True
                    ) * m_av + half_av,
                    m_av, s_av,
                )
            )
        return parts[0] if heads == 1 else jnp.concatenate(parts, axis=1)

    ctx = (
        _ctx_block(0) if nb == 1
        else jnp.concatenate([_ctx_block(i) for i in range(nb)], axis=0)
    )

    attn_out_i8 = _requant_folded(
        _int_dot(ctx, wo_ref[:]),
        bo_ref[0] * m_o + _requant_half(s_o), m_o, s_o,
    )

    attn_f = attn_out_i8.astype(jnp.float32) * fscal_ref[0, _FS_ATTN_OUT]
    h = _layer_norm(x + attn_f, ln1_g_ref[0], ln1_b_ref[0])

    h_i8 = _quantize(h, fscal_ref[0, _FS_FFN_IN])
    # ReLU folds into the fc1 requant's clip bounds — exact:
    # relu(clip(v, -128, 127)) == clip(v, 0, 127) — one fewer
    # full-width pass over the (nb*S, F) activation.
    ff1_relu = jnp.clip(
        (_int_dot(h_i8, w1_ref[:]) * m_1
         + (b1_ref[0] * m_1 + _requant_half(s_1)))
        >> jnp.clip(s_1, 0, 31),
        0, 127,
    )
    relu8 = _requant_folded_i8(
        ff1_relu,
        _requant_half(iscal_ref[0, _IRELU_SHIFT]),
        iscal_ref[0, _IRELU_MULT], iscal_ref[0, _IRELU_SHIFT],
    )
    ff2 = _requant_folded(
        _int_dot(relu8, w2_ref[:]), b2_ref[0] * m_2 + _requant_half(s_2),
        m_2, s_2,
    )

    ffn_f = ff2.astype(jnp.float32) * fscal_ref[0, _FS_FFN_OUT]
    return _layer_norm(h + ffn_f, ln2_g_ref[0], ln2_b_ref[0])


def _layer_norm_T(x, g, b, eps=1e-5):
    """LayerNorm on channels-on-sublanes activations: x (E, L), feature
    reduction over axis 0, per-feature g/b as (E, 1) columns broadcast
    along lanes. Same f32 math as _layer_norm up to reduction order."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=0, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _dot_T(w, x):
    """(K, N) weights x (K, L) activations -> (N, L), i32 accumulation:
    the transposed-layout GEMM (contract dim 0 of both — the MXU streams
    the lhs transposed natively, same cost as _int_dot)."""
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def encoder_core_batched_T(
    xT,            # (E, nb*S) f32 value — channels on SUBLANES
    softmax_mode,  # static: 'onepass' | 'streaming'
    nb,            # static: sequences folded into the lane axis
    seq,           # static: sequence length S
    iscal_ref, fscal_ref,
    wq_ref, cq_ref, wk_ref, ck_ref, wv_ref, cv_ref,  # i8 (E,P) / i32 (P,1)
    wo_ref, co_ref,                                   # i8 (P,E) / i32 (E,1)
    w1_ref, c1_ref, w2_ref, c2_ref,                   # i8 (E,F),(F,E) / i32
    ln1_g_ref, ln1_b_ref, ln2_g_ref, ln2_b_ref,       # f32 (E,1)
    heads: int = 1,
):
    """encoder_core_batched in the fully TRANSPOSED layout: activations
    live as (channels, nb*S) with the folded batch on LANES.

    Why: the flagship's feature dims (E=64, P=192) under-fill the
    128-lane VPU in the row-major layout — every glue/requant/LN pass
    over (nb*S, 64) runs at 50% lane occupancy and (nb*S, 192) at 75%
    (the round-4 lane-occupancy lesson, applied to the OTHER operand
    axis). With channels on sublanes every elementwise pass is
    full-width over L = nb*S = 1024 lanes, LN reduces over 64 sublanes,
    and the MXU dots contract dim 0 of both operands (natively
    supported, same FLOPs). The (S, nb*S) logits/softmax stage is
    IDENTICAL to encoder_core_batched — it was already transposed.

    Integer arithmetic is bit-identical to encoder_core per element
    (same requant/softmax helpers, layout only); the f32 LayerNorm
    reduces over sublanes instead of lanes, so float outputs agree with
    the row-major cores to reduction-order ulps (the same tolerance the
    kernel-vs-golden tests already use).

    Bias handling: requant bias vectors arrive PRE-FOLDED as (N, 1) i32
    columns cN = b*mult + half (see _requant_folded — exact in i32),
    computed host-side by ita_encoder_block_T.
    """
    s_attn_in = fscal_ref[0, _FS_ATTN_IN]
    x_i8 = _quantize(xT, s_attn_in)                    # (E, L) i8

    m_q, s_q = iscal_ref[0, _IQ_MULT], iscal_ref[0, _IQ_SHIFT]
    m_k, s_k = iscal_ref[0, _IK_MULT], iscal_ref[0, _IK_SHIFT]
    m_v, s_v = iscal_ref[0, _IV_MULT], iscal_ref[0, _IV_SHIFT]
    m_o, s_o = iscal_ref[0, _IO_MULT], iscal_ref[0, _IO_SHIFT]
    m_1, s_1 = iscal_ref[0, _IFC1_MULT], iscal_ref[0, _IFC1_SHIFT]
    m_2, s_2 = iscal_ref[0, _IFC2_MULT], iscal_ref[0, _IFC2_SHIFT]

    qp8 = _requant_folded_i8(_dot_T(wq_ref[:], x_i8), cq_ref[:], m_q, s_q)
    kp8 = _requant_folded_i8(_dot_T(wk_ref[:], x_i8), ck_ref[:], m_k, s_k)
    vp8 = _requant_folded_i8(_dot_T(wv_ref[:], x_i8), cv_ref[:], m_v, s_v)

    d = qp8.shape[0] // heads
    # Transposed logits (S_keys, S_q) per sequence/head — K @ Q^T via a
    # dim-0 contraction of the (d, S) column slices; NO 1/sqrt(d).
    logitT_parts = [
        jax.lax.dot_general(
            kp8[hd * d : (hd + 1) * d, i * seq : (i + 1) * seq],
            qp8[hd * d : (hd + 1) * d, i * seq : (i + 1) * seq],
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        for i in range(nb)
        for hd in range(heads)
    ]
    logitsT = (
        logitT_parts[0] if len(logitT_parts) == 1
        else jnp.concatenate(logitT_parts, axis=1)
    )  # (S, nb*heads*S)
    aT_i8 = _requant(
        logitsT, iscal_ref[0, _IQK_MULT], iscal_ref[0, _IQK_SHIFT]
    )
    if softmax_mode == "streaming":
        p8T = _integer_softmax_streaming_T_p8(aT_i8)
    else:
        p8T = _integer_softmax_T_p8(aT_i8)

    m_av, s_av = iscal_ref[0, _IAV_MULT], iscal_ref[0, _IAV_SHIFT]
    half_av = _requant_half(s_av)

    def _ctx_block_T(i):
        """ctx^T columns for sequence i: per-head V^T @ (A-128)^T plus
        the exact 128*rowsum(v) offset compensation, heads stacked on
        sublanes."""
        parts = []
        for hd in range(heads):
            v_h = vp8[hd * d : (hd + 1) * d, i * seq : (i + 1) * seq]
            cols2 = slice((i * heads + hd) * seq, (i * heads + hd + 1) * seq)
            acc = jax.lax.dot_general(
                v_h, p8T[:, cols2], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (d, S_q)
            parts.append(
                _requant_folded_i8(
                    acc,
                    128 * jnp.sum(
                        v_h.astype(jnp.int32), axis=1, keepdims=True
                    ) * m_av + half_av,
                    m_av, s_av,
                )
            )
        return parts[0] if heads == 1 else jnp.concatenate(parts, axis=0)

    ctxT = (
        _ctx_block_T(0) if nb == 1
        else jnp.concatenate([_ctx_block_T(i) for i in range(nb)], axis=1)
    )  # (P, nb*S) i8

    attn_outT = _requant_folded(
        _dot_T(wo_ref[:], ctxT), co_ref[:], m_o, s_o
    )  # (E, L)

    attn_f = attn_outT.astype(jnp.float32) * fscal_ref[0, _FS_ATTN_OUT]
    h = _layer_norm_T(xT + attn_f, ln1_g_ref[:], ln1_b_ref[:])

    h_i8 = _quantize(h, fscal_ref[0, _FS_FFN_IN])
    # ReLU folded into the fc1 requant clip (exact; see
    # encoder_core_batched).
    ff1_relu = jnp.clip(
        (_dot_T(w1_ref[:], h_i8) * m_1 + c1_ref[:])
        >> jnp.clip(s_1, 0, 31),
        0, 127,
    )  # (F, L)
    relu8 = _requant_folded_i8(
        ff1_relu,
        _requant_half(iscal_ref[0, _IRELU_SHIFT]),
        iscal_ref[0, _IRELU_MULT], iscal_ref[0, _IRELU_SHIFT],
    )
    ff2 = _requant_folded(_dot_T(w2_ref[:], relu8), c2_ref[:], m_2, s_2)

    ffn_f = ff2.astype(jnp.float32) * fscal_ref[0, _FS_FFN_OUT]
    return _layer_norm_T(h + ffn_f, ln2_g_ref[:], ln2_b_ref[:])


def _encoder_block_kernel_T(
    softmax_mode,  # static: 'onepass' | 'streaming'
    nb,            # static: sequences per grid step
    seq,           # static: sequence length S
    heads,         # static: attention heads
    pre_ln,        # static: LayerNorm xT in-kernel (turbo fusion)
    iscal_ref, fscal_ref,
    x_ref,         # VMEM (E, nb*S) f32/bf16 — a lane slice of (E, B*S)
    *w_refs,       # [pre-LN g/b (E,1),] weight/cvec/LN refs + out_ref
):
    out_ref = w_refs[-1]
    w_refs = w_refs[:-1]
    if pre_ln:
        png_ref, pnb_ref = w_refs[:2]
        w_refs = w_refs[2:]
    x = x_ref[...].astype(jnp.float32)   # (E, nb*S) — no reshape needed
    if pre_ln:
        x = _layer_norm_T(x, png_ref[:], pnb_ref[:])
    out = encoder_core_batched_T(
        x, softmax_mode, nb, seq, iscal_ref, fscal_ref, *w_refs,
        heads=heads,
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _fold_bias_cvec(b, mult, shift):
    """Host-side _requant_folded constant: (b*mult + half) as an (N, 1)
    i32 column (exact i32; the same fold encoder_core_batched does
    in-kernel per call)."""
    b = jnp.asarray(b, jnp.int32)
    return (b * mult + _requant_half(shift))[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("seq", "interpret", "softmax_mode", "max_nb",
                     "out_dtype"),
)
def ita_encoder_block_T(
    xT: jax.Array,  # (E, B*S) f32/bf16 — channels-on-sublanes layout
    attn: IntAttentionParams,
    ffn: IntFFNParams,
    ln1: dict,
    ln2: dict,
    *,
    seq: int,
    interpret: bool = False,
    softmax_mode: str = "onepass",
    max_nb: int = 8,
    pre_ln: dict | None = None,
    out_dtype=None,
) -> jax.Array:
    """Fused quantized encoder layer in the fully TRANSPOSED layout:
    tokens arrive and leave as (E, B*S) with the folded batch on lanes
    (producer: models/layers.tokenizer_tokens_factored_T; consumer: an
    e-major precomposed tail matrix — quant/batched.make_tail
    e_major=True). Integer region bit-identical to ita_encoder_block;
    f32 LayerNorm differs only in reduction order (sublane-axis). See
    encoder_core_batched_T for why: full 128-lane occupancy on every
    glue/requant pass over the flagship's E=64/P=192 feature dims."""
    if softmax_mode not in ("onepass", "streaming"):
        raise ValueError(f"unknown softmax mode {softmax_mode!r}")
    heads = attn.num_heads
    e, ltot = xT.shape
    if ltot % seq != 0:
        raise ValueError(f"lane dim {ltot} not a multiple of seq {seq}")
    b = ltot // seq
    p = attn.q.w.shape[1]
    f = ffn.fc1.w.shape[1]
    if p % heads != 0:
        raise ValueError(f"P={p} not divisible by H={heads}")
    iscal, fscal = pack_block_scalars(attn, ffn)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def vmem_const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    col = lambda n: vmem_const((n, 1))
    nb = next(n for n in (max_nb, 8, 4, 2, 1) if n <= max_nb and b % n == 0)
    xblock = (e, nb * seq)
    pre_ln_specs = [col(e), col(e)] if pre_ln is not None else []
    pre_ln_args = (
        [
            jnp.asarray(pre_ln["g"], jnp.float32)[:, None],
            jnp.asarray(pre_ln["b"], jnp.float32)[:, None],
        ]
        if pre_ln is not None
        else []
    )
    colf = lambda v: jnp.asarray(v, jnp.float32)[:, None]
    return pl.pallas_call(
        functools.partial(
            _encoder_block_kernel_T, softmax_mode, nb, seq, heads,
            pre_ln is not None,
        ),
        grid=(b // nb,),
        in_specs=[
            smem((1, N_ISCALARS)),
            smem((1, N_FSCALARS)),
            pl.BlockSpec(xblock, lambda i: (0, i), memory_space=pltpu.VMEM),
            *pre_ln_specs,
            vmem_const((e, p)), col(p),
            vmem_const((e, p)), col(p),
            vmem_const((e, p)), col(p),
            vmem_const((p, e)), col(e),
            vmem_const((e, f)), col(f),
            vmem_const((f, e)), col(e),
            col(e), col(e), col(e), col(e),
        ],
        out_specs=pl.BlockSpec(
            xblock, lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((e, ltot), out_dtype or jnp.float32),
        interpret=interpret,
    )(
        iscal, fscal, xT,
        *pre_ln_args,
        attn.q.w, _fold_bias_cvec(attn.q.b, attn.q.mult, attn.q.shift),
        attn.k.w, _fold_bias_cvec(attn.k.b, attn.k.mult, attn.k.shift),
        attn.v.w, _fold_bias_cvec(attn.v.b, attn.v.mult, attn.v.shift),
        attn.o.w, _fold_bias_cvec(attn.o.b, attn.o.mult, attn.o.shift),
        ffn.fc1.w, _fold_bias_cvec(ffn.fc1.b, ffn.fc1.mult, ffn.fc1.shift),
        ffn.fc2.w, _fold_bias_cvec(ffn.fc2.b, ffn.fc2.mult, ffn.fc2.shift),
        colf(ln1["g"]), colf(ln1["b"]),
        colf(ln2["g"]), colf(ln2["b"]),
    )


def _encoder_block_kernel(
    softmax_mode,  # static (functools.partial): 'onepass' | 'streaming'
    nb,            # static: sequences per grid step
    seq,           # static: sequence length S
    heads,         # static: attention heads
    transposed_io, # static: blocks arrive/leave as (nb, E, S) channel-first
    batched_core,  # static: use the batched-attention core (throughput)
    pre_ln,        # static: LayerNorm x in-kernel (turbo tokenizer fusion)
    iscal_ref,  # SMEM (1, 20) i32
    fscal_ref,  # SMEM (1, 4) f32
    x_ref,      # VMEM (nb, S, E) f32/bf16 — or (nb, E, S) transposed_io
    *w_refs,    # [pre-LN g/b refs,] weight/bias/LN refs + out_ref last
):
    out_ref = w_refs[-1]
    w_refs = w_refs[:-1]
    if pre_ln:
        png_ref, pnb_ref = w_refs[:2]
        w_refs = w_refs[2:]
    # Fold the nb sequences into the row axis: every projection / FFN
    # matmul then runs as one (nb*S, K) x (K, N) GEMM — at nb=8, S=128
    # that is 1024 MXU rows instead of 128, which is what makes the
    # batched kernel competitive with XLA's cross-batch GEMM batching.
    if transposed_io:
        # Channel-first blocks: transpose inside VMEM (cheap) so the
        # XLA side never has to materialize a (B,S,E) layout at all.
        e = x_ref.shape[1]
        x = jnp.transpose(x_ref[...], (0, 2, 1)).reshape(nb * seq, e)
    else:
        e = x_ref.shape[-1]
        x = x_ref[...].reshape(nb * seq, e)  # (nb*S, E)
    x = x.astype(jnp.float32)
    if pre_ln:
        # Tokenizer LN fused in-kernel (f32 on the VPU): the turbo path
        # hands over raw bf16 tokenizer-GEMM tokens (half the input
        # traffic) and this reproduces models/layers.layer_norm exactly.
        x = _layer_norm(x, png_ref[0], pnb_ref[0])

    core = encoder_core_batched if batched_core else encoder_core
    out = core(
        x, softmax_mode, nb, seq, iscal_ref, fscal_ref, *w_refs, heads=heads
    )
    out = out.astype(out_ref.dtype)
    if transposed_io:
        out_ref[...] = jnp.transpose(out.reshape(nb, seq, e), (0, 2, 1))
    else:
        out_ref[...] = out.reshape(nb, seq, e)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "softmax_mode", "transposed_io", "max_nb",
        "batched_core", "out_dtype",
    ),
)
def ita_encoder_block(
    x: jax.Array,  # (B, S, E) f32/bf16 — or (B, E, S) when transposed_io
    attn: IntAttentionParams,
    ffn: IntFFNParams,
    ln1: dict,
    ln2: dict,
    interpret: bool = False,
    softmax_mode: str = "onepass",
    transposed_io: bool = False,
    max_nb: int = 8,
    batched_core: bool = False,
    pre_ln: dict | None = None,
    out_dtype=None,
) -> jax.Array:
    """One fused quantized encoder layer on TPU (B small; grid over B).

    Numerically identical to:
        h = LN(x + ita_attention_f32(x, attn)); LN(h + ita_ffn_f32(h, ffn))
    (ops/integer_ita.py golden path; H from attn.num_heads — head-split
    layouts are static-unrolled column slices of the P projection, P=192
    dividing into MXU-friendly d for H in {1,2,3}).
    ``softmax_mode='streaming'`` selects the hardware's partial softmax
    (matches the golden path's same flag).

    Throughput extras (the turbo path): ``pre_ln={'g','b'}`` fuses the
    tokenizer LayerNorm in-kernel (pass raw bf16 tokenizer tokens, half
    the input traffic; LN math stays f32 on the VPU); ``out_dtype``
    (e.g. bf16) emits the output in the glue dtype the consumer reads —
    the same cast it would apply anyway, at half the output traffic.
    """
    if softmax_mode not in ("onepass", "streaming"):
        raise ValueError(f"unknown softmax mode {softmax_mode!r}")
    heads = attn.num_heads
    if attn.q.w.shape[1] % heads != 0:
        raise ValueError(
            f"P={attn.q.w.shape[1]} not divisible by H={heads}"
        )
    if transposed_io:
        b, e, s = x.shape
    else:
        b, s, e = x.shape
    p = attn.q.w.shape[1]
    f = ffn.fc1.w.shape[1]
    iscal, fscal = pack_block_scalars(attn, ffn)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def vmem_const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    row = lambda n: vmem_const((1, n))

    # Sequences per grid step: fold up to 8 sequences into one block so
    # the projection/FFN GEMMs see nb*S rows (MXU utilization; VMEM use
    # stays ~5 MB at nb=8 for the flagship dims).
    nb = next(n for n in (max_nb, 8, 4, 2, 1) if n <= max_nb and b % n == 0)

    xblock = (nb, e, s) if transposed_io else (nb, s, e)
    pre_ln_specs = [row(e), row(e)] if pre_ln is not None else []
    pre_ln_args = (
        [
            jnp.asarray(pre_ln["g"], jnp.float32)[None, :],
            jnp.asarray(pre_ln["b"], jnp.float32)[None, :],
        ]
        if pre_ln is not None
        else []
    )
    return pl.pallas_call(
        functools.partial(
            _encoder_block_kernel, softmax_mode, nb, s, heads,
            transposed_io, batched_core, pre_ln is not None,
        ),
        grid=(b // nb,),
        in_specs=[
            smem((1, N_ISCALARS)),
            smem((1, N_FSCALARS)),
            pl.BlockSpec(xblock, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *pre_ln_specs,
            vmem_const((e, p)), row(p),
            vmem_const((e, p)), row(p),
            vmem_const((e, p)), row(p),
            vmem_const((p, e)), row(e),
            vmem_const((e, f)), row(f),
            vmem_const((f, e)), row(e),
            row(e), row(e), row(e), row(e),
        ],
        out_specs=pl.BlockSpec(
            xblock, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, e, s) if transposed_io else (b, s, e),
            out_dtype or jnp.float32,
        ),
        interpret=interpret,
    )(
        iscal, fscal, x,
        *pre_ln_args,
        attn.q.w, attn.q.b[None, :],
        attn.k.w, attn.k.b[None, :],
        attn.v.w, attn.v.b[None, :],
        attn.o.w, attn.o.b[None, :],
        ffn.fc1.w, ffn.fc1.b[None, :],
        ffn.fc2.w, ffn.fc2.b[None, :],
        ln1["g"][None, :], ln1["b"][None, :],
        ln2["g"][None, :], ln2["b"][None, :],
    )
