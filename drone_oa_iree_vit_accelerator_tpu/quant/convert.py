"""QAT -> int8 conversion: freeze observers into hardware parameters.

The analog of torch ``convert()`` + the reference's parameter extractor
(tests/export_and_validation_W_B.py:108-305): observer statistics become
activation scales; weights quantize to int8; biases fold to int32; every
stage's effective rescale factor becomes an (8-bit multiplier, shift)
pair via frexp.

Effective-scale derivations (reference file:line):

    linear stages:  s_in * s_w / s_out            (:254)
    qk matmul:      s_q * s_k / s_qk              (:265-268)
    av matmul:      (1/255) * s_v / s_av          (:269-274, softmax
                    output scale is fixed 1/255, zp 0)
    relu bridge:    s_fc1 / s_relu                (:278-301)

Everything here is pure jnp and jit-able: conversion runs entirely on
device (jnp.frexp for the multiplier encoding, device-side bias folding).
No host synchronization — required both for idiomatic deployment (the
convert can be part of a larger compiled program) and because host
round-trips degrade some platforms' dispatch latency.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.integer_ita import (
    IntAttentionParams,
    IntFFNParams,
    QuantLinearParams,
)
from ..ops.ita_softmax import SOFTMAX_OUT_SCALE
from ..ops.quant import (
    fold_bias_jnp,
    hw_params_jnp,
    observer_scale,
    quantize,
)
from .qat import AttnObservers, FFNObservers, QATObservers, weight_scale


def _quant_linear(
    p: dict, s_in, s_out, per_channel: bool = False
) -> QuantLinearParams:
    """Quantize one linear layer's weights + fold its bias.

    ``per_channel=True`` gives every output channel its own weight scale
    (and therefore its own (mult, shift) requant pair and int32 bias fold)
    — the reference ARM config's per_channel_symmetric weight observer
    (reference tests/p2e_backup/ita_quantization_specs.py:47-67).
    ops.quant.requant broadcasts vector mult/shift over the last axis, so
    the integer XLA path handles both layouts with the same code; the
    Pallas kernel's SMEM scalar packing requires per-tensor.
    """
    w = p["w"]
    s_w = weight_scale(w, per_channel=per_channel)
    mult, shift = hw_params_jnp(s_in * s_w / s_out)
    return QuantLinearParams(
        w=quantize(w, s_w),
        b=fold_bias_jnp(p["b"], s_in, s_w),
        mult=mult,
        shift=shift,
        add=jnp.int32(0),
        s_in=jnp.asarray(s_in, jnp.float32),
        s_w=jnp.asarray(s_w, jnp.float32),
        s_out=jnp.asarray(s_out, jnp.float32),
    )


def convert_attention(
    p: dict, obs: AttnObservers, num_heads: int, per_channel: bool = False
) -> IntAttentionParams:
    s_in = observer_scale(obs.in_)
    s_q = observer_scale(obs.q)
    s_k = observer_scale(obs.k)
    s_v = observer_scale(obs.v)
    s_qk = observer_scale(obs.qk)
    s_av = observer_scale(obs.av)
    s_out = observer_scale(obs.out)

    qk_mult, qk_shift = hw_params_jnp(s_q * s_k / s_qk)
    av_mult, av_shift = hw_params_jnp(SOFTMAX_OUT_SCALE * s_v / s_av)

    return IntAttentionParams(
        q=_quant_linear(p["q"], s_in, s_q, per_channel),
        k=_quant_linear(p["k"], s_in, s_k, per_channel),
        v=_quant_linear(p["v"], s_in, s_v, per_channel),
        o=_quant_linear(p["o"], s_av, s_out, per_channel),
        qk_mult=qk_mult,
        qk_shift=qk_shift,
        qk_add=jnp.int32(0),
        av_mult=av_mult,
        av_shift=av_shift,
        av_add=jnp.int32(0),
        s_in=jnp.asarray(s_in, jnp.float32),
        s_out=jnp.asarray(s_out, jnp.float32),
        num_heads=num_heads,
    )


def convert_ffn(
    p: dict, obs: FFNObservers, per_channel: bool = False
) -> IntFFNParams:
    s_in = observer_scale(obs.in_)
    s_fc1 = observer_scale(obs.fc1)
    s_relu = observer_scale(obs.relu)
    s_fc2 = observer_scale(obs.fc2)

    relu_mult, relu_shift = hw_params_jnp(s_fc1 / s_relu)

    return IntFFNParams(
        fc1=_quant_linear(p["fc1"], s_in, s_fc1, per_channel),
        relu_mult=relu_mult,
        relu_shift=relu_shift,
        relu_add=jnp.int32(0),
        fc2=_quant_linear(p["fc2"], s_relu, s_fc2, per_channel),
        s_in=jnp.asarray(s_in, jnp.float32),
        s_out=jnp.asarray(s_fc2, jnp.float32),
    )


def convert_model(
    params: dict,
    observers: QATObservers,
    num_heads: int,
    per_channel: bool = False,
) -> dict:
    """Convert every quantized block; returns {'attn': (...), 'ffn': (...)}.

    Pure function of (params, observers) — jit it for on-device conversion.
    ``per_channel=True`` selects per-output-channel weight scales (XLA
    integer path only; the Pallas kernel requires per-tensor).
    """
    return {
        "attn": tuple(
            convert_attention(blk["attn"], obs, num_heads, per_channel)
            for blk, obs in zip(params["blocks"], observers.attn)
        ),
        "ffn": tuple(
            convert_ffn(blk["ffn"], obs, per_channel)
            for blk, obs in zip(params["blocks"], observers.ffn)
        ),
    }
