"""Quantization-aware training of the ITA attention/FFN blocks.

JAX equivalent of the reference's eager-mode QAT
(models/ITA/QAT/layers.py + torch prepare_qat): the attention and FFN
sub-blocks are bracketed by fake-quant boundaries; every activation that
the hardware requantizes gets a moving-average min/max observer; weights
are fake-quantized per-tensor symmetric; the softmax runs the integer
simulation with a float-softmax surrogate gradient.

Observer states are threaded explicitly: each QAT forward returns the
updated observer pytree (the functional analog of torch's buffer
mutation). Gradients flow through fake_quant_ste; observer updates are
non-differentiable by construction.

Observed tensors per attention block (matching the hooks the reference's
verifier relies on, tests/export_and_validation_W_B.py:25-102):

    in      the block input (QuantStub)
    q/k/v   projection outputs
    qk      attention logits (FloatFunctional matmul1 output)
    av      context (matmul2 output)
    out     out-projection output (DeQuantStub boundary)

and per FFN block: in, fc1, relu, fc2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.ita_softmax import ita_softmax_fakequant
from ..ops.quant import (
    ObserverState,
    fake_quant_ste,
    observe,
    observer_scale,
    symmetric_scale,
)


@struct.dataclass
class AttnObservers:
    in_: ObserverState
    q: ObserverState
    k: ObserverState
    v: ObserverState
    qk: ObserverState
    av: ObserverState
    out: ObserverState

    @classmethod
    def init(cls) -> "AttnObservers":
        return cls(*(ObserverState.init() for _ in range(7)))


@struct.dataclass
class FFNObservers:
    in_: ObserverState
    fc1: ObserverState
    relu: ObserverState
    fc2: ObserverState

    @classmethod
    def init(cls) -> "FFNObservers":
        return cls(*(ObserverState.init() for _ in range(4)))


@struct.dataclass
class QATObservers:
    """Observers for every quantized block in the model (one per layer)."""

    attn: tuple[AttnObservers, ...]
    ffn: tuple[FFNObservers, ...]

    @classmethod
    def init(cls, num_layers: int) -> "QATObservers":
        return cls(
            attn=tuple(AttnObservers.init() for _ in range(num_layers)),
            ffn=tuple(FFNObservers.init() for _ in range(num_layers)),
        )


def weight_scale(w: jax.Array, per_channel: bool = False) -> jax.Array:
    """Symmetric weight scale from the current weight extrema.

    torch observes weights through the same moving-average observer, but
    since the observed tensor IS the weight (changing slowly), the
    converged statistics equal the current extrema; we use them directly.

    ``per_channel=True`` returns one scale per output channel (w is stored
    (in, out), so the reduction is over axis 0) — the reference's ARM
    deployment config uses per_channel_symmetric weight observers
    (reference tests/p2e_backup/ita_quantization_specs.py:47-67); the ITA
    hardware itself requantizes per-tensor, so per-channel is an XLA-path
    accuracy option, not a kernel mode.
    """
    if per_channel:
        return symmetric_scale(jnp.min(w, axis=0), jnp.max(w, axis=0))
    return symmetric_scale(jnp.min(w), jnp.max(w))


def _fq_weight(w: jax.Array) -> jax.Array:
    return fake_quant_ste(w, weight_scale(w))


def _observe_fq(
    x: jax.Array, st: ObserverState, update: bool
) -> tuple[jax.Array, ObserverState]:
    """Observe-then-fake-quantize (torch FusedMovingAvgObsFakeQuantize:
    the observer ingests the batch first, qparams derive from the updated
    statistics)."""
    if update:
        st = observe(st, jax.lax.stop_gradient(x))
    return fake_quant_ste(x, observer_scale(st)), st


def attention_qat(
    x: jax.Array,
    p: dict,
    obs: AttnObservers,
    num_heads: int,
    update_obs: bool = True,
    softmax_mode: str = "onepass",
) -> tuple[jax.Array, AttnObservers]:
    """Fake-quant ITA attention on (B, S, E); mirrors reference
    models/ITA/QAT/layers.py:101-127 (no logit scaling, integer-sim
    softmax, quantized matmuls). ``softmax_mode='streaming'`` trains
    against the hardware's partial-softmax forward instead of the
    global-max one (same float-softmax surrogate gradient)."""
    b, s, _ = x.shape
    x_fq, in_st = _observe_fq(x, obs.in_, update_obs)

    q = x_fq @ _fq_weight(p["q"]["w"]) + p["q"]["b"]
    k = x_fq @ _fq_weight(p["k"]["w"]) + p["k"]["b"]
    v = x_fq @ _fq_weight(p["v"]["w"]) + p["v"]["b"]
    q_fq, q_st = _observe_fq(q, obs.q, update_obs)
    k_fq, k_st = _observe_fq(k, obs.k, update_obs)
    v_fq, v_st = _observe_fq(v, obs.v, update_obs)

    proj = q.shape[-1]
    d = proj // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhsd,bhtd->bhst", heads(q_fq), heads(k_fq))
    logits_fq, qk_st = _observe_fq(logits, obs.qk, update_obs)

    probs = ita_softmax_fakequant(logits_fq, mode=softmax_mode)  # scale 1/255 out

    ctx = jnp.einsum("bhst,bhtd->bhsd", probs, heads(v_fq))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, proj)
    ctx_fq, av_st = _observe_fq(ctx, obs.av, update_obs)

    out = ctx_fq @ _fq_weight(p["o"]["w"]) + p["o"]["b"]
    out_fq, out_st = _observe_fq(out, obs.out, update_obs)

    new_obs = AttnObservers(
        in_=in_st, q=q_st, k=k_st, v=v_st, qk=qk_st, av=av_st, out=out_st
    )
    return out_fq, new_obs


def ffn_qat(
    x: jax.Array,
    p: dict,
    obs: FFNObservers,
    update_obs: bool = True,
) -> tuple[jax.Array, FFNObservers]:
    """Fake-quant FFN (reference models/ITA/QAT/layers.py:47-75)."""
    x_fq, in_st = _observe_fq(x, obs.in_, update_obs)
    h = x_fq @ _fq_weight(p["fc1"]["w"]) + p["fc1"]["b"]
    h_fq, fc1_st = _observe_fq(h, obs.fc1, update_obs)
    r = jax.nn.relu(h_fq)
    r_fq, relu_st = _observe_fq(r, obs.relu, update_obs)
    y = r_fq @ _fq_weight(p["fc2"]["w"]) + p["fc2"]["b"]
    y_fq, fc2_st = _observe_fq(y, obs.fc2, update_obs)
    return y_fq, FFNObservers(in_=in_st, fc1=fc1_st, relu=relu_st, fc2=fc2_st)


def qat_block_fns(params: dict, observers: QATObservers, num_heads: int,
                  update_obs: bool = True, quantize_ffn: bool = True,
                  softmax_mode: str = "onepass"):
    """Build (attn_fn, ffn_fn, collect) for models.vit_lstm.forward.

    Because BlockFn is (i, x) -> y while QAT must also return updated
    observers, updates are collected in a mutable side list and merged by
    ``collect()`` after the forward — call it exactly once per step.
    ``quantize_ffn=False`` gives the reference's QAT_only_attn ablation
    (FFN stays float, models/*/QAT_only_attn/model.py).
    """
    new_attn: dict[int, AttnObservers] = {}
    new_ffn: dict[int, FFNObservers] = {}

    def attn_fn(i, x):
        y, st = attention_qat(
            x, params["blocks"][i]["attn"], observers.attn[i], num_heads,
            update_obs, softmax_mode=softmax_mode,
        )
        new_attn[i] = st
        return y

    def ffn_fn(i, x):
        if not quantize_ffn:
            from ..models import layers as L

            return L.ffn_f32(x, params["blocks"][i]["ffn"])
        y, st = ffn_qat(x, params["blocks"][i]["ffn"], observers.ffn[i], update_obs)
        new_ffn[i] = st
        return y

    def collect() -> QATObservers:
        return QATObservers(
            attn=tuple(
                new_attn.get(i, observers.attn[i]) for i in range(len(observers.attn))
            ),
            ffn=tuple(
                new_ffn.get(i, observers.ffn[i]) for i in range(len(observers.ffn))
            ),
        )

    return attn_fn, ffn_fn, collect
