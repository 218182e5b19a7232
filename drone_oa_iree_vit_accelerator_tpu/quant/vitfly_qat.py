"""QAT + int8 conversion for the vitfly (Mix-Transformer) attention.

The TPU-native analog of the reference's alt export path: the upstream
2-stage ITALSTM swaps every EfficientSelfAttention for an ITA attention
with explicit per-stage requantization — ``MultiheadITAWithRequant``
(reference scripts/export_model.py:119-162) wrapped so the K/V spatial
reduction (conv + LN) stays float (ITASelfAttentionWrapper,
export_model.py:164-182). The reference ships that module as a float
EMULATION with placeholder requant params (mult 1 / shift 0 defaults,
export_model.py:211-214); here the pipeline is completed end-to-end:

    observers -> real scales -> frexp mult/shift -> true integer
    execution (ops/integer_ita.vitfly_attention_int8)

with the same QAT observer/fake-quant discipline as the ITA family
(quant/qat.py) and the same stage-wise <= 1 LSB parity contract
(tests/test_vitfly_quant.py).

Quantized region per attention block (matching the emulation's stages):
q/k/v projections (K/V from the fused ``kv`` linear, split column-wise
exactly as the reference reshape does: first C columns = K, next C = V,
export_model.py:73-74), QK^T logits (NO 1/sqrt(d) — the requant scale
absorbs it, unlike the float EfficientSelfAttention), integer softmax,
AV, out-projection, and the emulation's extra FINAL output requant
(mf/sf, export_model.py:156-157). MixFFN, LayerNorms, the reduction
conv, decoder, and LSTM stay float — the reference's quantized region
is attention-only for this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import vitfly as VF
from ..ops.integer_ita import (
    VitflyIntAttentionParams,
    vitfly_attention_f32,
)
from ..ops.ita_softmax import SOFTMAX_OUT_SCALE, ita_softmax_fakequant
from ..ops.quant import ObserverState, hw_params_jnp, observer_scale
from .convert import _quant_linear
from .qat import _fq_weight, _observe_fq


@struct.dataclass
class VitflyAttnObservers:
    """Observers for one vitfly attention block: two INPUT observers
    (q from full tokens, kv from the reduced copy — different tensors,
    different scales) plus one per requantized stage."""

    q_in: ObserverState
    kv_in: ObserverState
    q: ObserverState
    k: ObserverState
    v: ObserverState
    qk: ObserverState
    av: ObserverState
    out: ObserverState
    final: ObserverState

    @classmethod
    def init(cls) -> "VitflyAttnObservers":
        return cls(*(ObserverState.init() for _ in range(9)))


@struct.dataclass
class VitflyObservers:
    """One VitflyAttnObservers per (stage, layer)."""

    attn: tuple[tuple[VitflyAttnObservers, ...], ...]

    @classmethod
    def init(cls, cfg: VF.VitflyConfig) -> "VitflyObservers":
        return cls(
            attn=tuple(
                tuple(VitflyAttnObservers.init() for _ in range(sc.n_layers))
                for sc in cfg.stages
            )
        )


def split_kv(p: dict) -> tuple[dict, dict]:
    """Split the fused keyValueExtractor linear (C -> 2C) into separate
    K and V linears. Column order follows the reference reshape
    (B, N, 2C) -> (B, N, 2, H, d): the '2' axis is slowest, so columns
    [0:C] are K (all heads) and [C:2C] are V (export_model.py:73-74)."""
    w, b = p["kv"]["w"], p["kv"]["b"]
    c = w.shape[1] // 2
    return (
        {"w": w[:, :c], "b": b[:c]},
        {"w": w[:, c:], "b": b[c:]},
    )


def vitfly_attention_qat(
    x_q: jax.Array,   # (B, Nq, C) full tokens
    x_kv: jax.Array,  # (B, Nkv, C) reduced tokens (float conv+LN upstream)
    p: dict,          # vitfly attn params: q / kv / out (+ float reduce_*)
    obs: VitflyAttnObservers,
    heads: int,
    update_obs: bool = True,
) -> tuple[jax.Array, VitflyAttnObservers]:
    """Fake-quant vitfly attention — the QAT mirror of
    ops/integer_ita.vitfly_attention_int8, stage for stage.

    Softmax: onepass integer simulation (fixed 1/255 output scale).
    Nkv < ITA_N=16 everywhere in this family, so the hardware's partial
    softmax degenerates to the full one (see vitfly_attention_int8)."""
    b, nq, c = x_q.shape
    xq_fq, qin_st = _observe_fq(x_q, obs.q_in, update_obs)
    xkv_fq, kvin_st = _observe_fq(x_kv, obs.kv_in, update_obs)

    kp, vp = split_kv(p)
    q = xq_fq @ _fq_weight(p["q"]["w"]) + p["q"]["b"]
    k = xkv_fq @ _fq_weight(kp["w"]) + kp["b"]
    v = xkv_fq @ _fq_weight(vp["w"]) + vp["b"]
    q_fq, q_st = _observe_fq(q, obs.q, update_obs)
    k_fq, k_st = _observe_fq(k, obs.k, update_obs)
    v_fq, v_st = _observe_fq(v, obs.v, update_obs)

    d = c // heads

    def split(t):
        return t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

    # NO 1/sqrt(d): the requant scale absorbs it (MultiheadITAWithRequant
    # has no logit scaling either, export_model.py:150-152).
    logits = jnp.einsum("bhsd,bhtd->bhst", split(q_fq), split(k_fq))
    logits_fq, qk_st = _observe_fq(logits, obs.qk, update_obs)

    probs = ita_softmax_fakequant(logits_fq, mode="onepass")  # 1/255 out

    ctx = jnp.einsum("bhst,bhtd->bhsd", probs, split(v_fq))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, nq, c)
    ctx_fq, av_st = _observe_fq(ctx, obs.av, update_obs)

    out = ctx_fq @ _fq_weight(p["out"]["w"]) + p["out"]["b"]
    out_fq, out_st = _observe_fq(out, obs.out, update_obs)
    # The emulation's extra final requant (mf/sf): a second fake-quant
    # boundary with its own observer.
    final_fq, final_st = _observe_fq(out_fq, obs.final, update_obs)

    return final_fq, VitflyAttnObservers(
        q_in=qin_st, kv_in=kvin_st, q=q_st, k=k_st, v=v_st,
        qk=qk_st, av=av_st, out=out_st, final=final_st,
    )


def convert_vitfly_attention(
    p: dict, obs: VitflyAttnObservers, heads: int
) -> VitflyIntAttentionParams:
    """Freeze observers into the integer parameters (the torch-convert
    analog; same effective-scale derivations as quant/convert.py plus
    final = s_out_proj / s_final for the mf/sf stage)."""
    s_q_in = observer_scale(obs.q_in)
    s_kv_in = observer_scale(obs.kv_in)
    s_q = observer_scale(obs.q)
    s_k = observer_scale(obs.k)
    s_v = observer_scale(obs.v)
    s_qk = observer_scale(obs.qk)
    s_av = observer_scale(obs.av)
    s_out = observer_scale(obs.out)
    s_final = observer_scale(obs.final)

    kp, vp = split_kv(p)
    qk_mult, qk_shift = hw_params_jnp(s_q * s_k / s_qk)
    av_mult, av_shift = hw_params_jnp(SOFTMAX_OUT_SCALE * s_v / s_av)
    final_mult, final_shift = hw_params_jnp(s_out / s_final)

    return VitflyIntAttentionParams(
        q=_quant_linear(p["q"], s_q_in, s_q),
        k=_quant_linear(kp, s_kv_in, s_k),
        v=_quant_linear(vp, s_kv_in, s_v),
        o=_quant_linear(p["out"], s_av, s_out),
        qk_mult=qk_mult, qk_shift=qk_shift, qk_add=jnp.int32(0),
        av_mult=av_mult, av_shift=av_shift, av_add=jnp.int32(0),
        final_mult=final_mult, final_shift=final_shift,
        final_add=jnp.int32(0),
        s_q_in=jnp.asarray(s_q_in, jnp.float32),
        s_kv_in=jnp.asarray(s_kv_in, jnp.float32),
        s_out=jnp.asarray(s_final, jnp.float32),
        num_heads=heads,
    )


def convert_vitfly_model(
    params: dict, observers: VitflyObservers, cfg: VF.VitflyConfig
) -> dict:
    """Convert every attention block; {'attn': ((stage0...), (stage1...))}."""
    return {
        "attn": tuple(
            tuple(
                convert_vitfly_attention(
                    params["stages"][si]["layers"][li]["attn"],
                    observers.attn[si][li],
                    sc.heads,
                )
                for li in range(sc.n_layers)
            )
            for si, sc in enumerate(cfg.stages)
        )
    }


def vitfly_qat_forward(
    cfg: VF.VitflyConfig,
    params: dict,
    observers: VitflyObservers,
    frame: jax.Array,
    vel: jax.Array,
    quat: jax.Array,
    state=None,
    update_obs: bool = True,
    training: bool = False,
    rng: jax.Array | None = None,
):
    """Full-model QAT forward: quantized-attention vitfly step.

    Returns (cmd, state, new_observers) — observer updates are collected
    through the attn_fn side channel and merged afterwards (same pattern
    as quant/qat.qat_block_fns)."""
    new: dict[tuple[int, int], VitflyAttnObservers] = {}

    def attn_fn(si, li, x, reduced):
        y, st = vitfly_attention_qat(
            x, reduced,
            params["stages"][si]["layers"][li]["attn"],
            observers.attn[si][li],
            cfg.stages[si].heads,
            update_obs,
        )
        new[(si, li)] = st
        return y

    cmd, st = VF.forward(
        cfg, params, frame, vel, quat, state,
        training=training, rng=rng, attn_fn=attn_fn,
    )
    merged = VitflyObservers(
        attn=tuple(
            tuple(
                new.get((si, li), observers.attn[si][li])
                for li in range(sc.n_layers)
            )
            for si, sc in enumerate(cfg.stages)
        )
    )
    return cmd, st, merged


def vitfly_int8_forward(
    cfg: VF.VitflyConfig,
    params: dict,
    vint_params: dict,
    frame: jax.Array,
    vel: jax.Array,
    quat: jax.Array,
    state=None,
    use_kernel: bool = False,
    interpret: bool = False,
):
    """Full-model forward with the TRUE integer attention path (the
    deployment analog of the reference's exported ITALSTM). jit this
    function directly with params AND vint_params as arguments.

    ``use_kernel=True`` runs each attention block as ONE fused Pallas
    kernel (ops/pallas/vitfly_kernel.py — the accelerator-region
    dispatch boundary) instead of ~30 small XLA ops; bit-identical
    (tests/test_vitfly_kernel.py). ``interpret`` runs that kernel in
    the Pallas interpreter (CPU)."""
    if use_kernel:
        from ..ops.pallas.vitfly_kernel import vitfly_attention_block

        def attn_fn(si, li, x, reduced):
            return vitfly_attention_block(
                x, reduced, vint_params["attn"][si][li],
                interpret=interpret,
            )
    else:
        def attn_fn(si, li, x, reduced):
            p = vint_params["attn"][si][li]
            return jax.vmap(lambda a, b: vitfly_attention_f32(a, b, p))(
                x, reduced
            )

    return VF.forward(cfg, params, frame, vel, quat, state, attn_fn=attn_fn)
