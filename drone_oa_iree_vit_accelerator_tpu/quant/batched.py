"""Throughput-optimized batched serving path ("turbo").

The round-2 batched paths spent ~65% of their device time outside the
model's actual math (per-op device traces, docs/op_breakdown.json):
the 1-input-channel tokenizer conv (XLA emits it at 25 TFLOP/s), the
dense kron resize (22 MFLOP/frame for a 2 MFLOP resize), the
9-output-channel fusion conv (7% MXU lane fill), and the layout copies
between them. This module is the TPU-native batched redesign:

- tokenizer: factored conv+resize operator
  (models/layers.tokenizer_tokens_factored) — three dense GEMMs,
  ~2.5 MFLOP/frame;
- encoder: the SAME bit-exact int8 region as every other path — fused
  Pallas kernel (ops/pallas/ita_kernel.ita_encoder_block) or the jnp
  golden path;
- fusion + decoder: ONE precomposed (S*E, 512) GEMM
  (models/vit_lstm.make_tail_matrix) — the pixel-shuffle/upsample/conv/
  decoder chain is linear, so it collapses exactly;
- LSTM + head + velocity postprocess: plain XLA (trivial at batch).

Float glue runs bf16 by default (the reference deploys its float part
f16: --iree-input-demote-f32-to-f16,
samples/inference_udp_FPGA_custom_dispatch/CMakeLists.txt:15-33); the
integer encoder region is bit-identical to ops/integer_ita.py either
way. Use ``glue_dtype=jnp.float32`` for the f32-glue variant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import FusionKind, ModelConfig
from ..models import layers as L
from ..models import vit_lstm as M


class TailMatrix(NamedTuple):
    w: jax.Array  # (S*E, decoder_out) — fusion+decoder composed
    b: jax.Array  # (decoder_out,)


def make_tail(cfg: ModelConfig, params: dict,
              dtype=jnp.bfloat16) -> TailMatrix:
    """Build the precomposed fusion+decoder matrix for the turbo path.

    For FLATTEN-fusion configs (ITA base / single_layer / upsample_
    shuffle) the fusion is the identity reshape, so the tail IS the
    (frozen) decoder weight."""
    if cfg.fusion is FusionKind.FLATTEN:
        fp = M.freeze_for_inference(cfg, params)
        dec = fp["decoder"]
        return TailMatrix(
            w=dec["w"].astype(dtype), b=dec["b"].astype(jnp.float32)
        )
    w, b = M.make_tail_matrix(cfg, params)
    return TailMatrix(w=w.astype(dtype), b=b.astype(jnp.float32))


def turbo_forward(
    cfg: ModelConfig,
    params: dict,
    int_params: dict,
    tail: TailMatrix,
    frame: jax.Array,          # (B, 1, 60, 90) f32 (already /255)
    vel: jax.Array,            # (B, 1)
    quat: jax.Array,           # (B, 4)
    state: M.LSTMState | None = None,
    *,
    encoder: str = "pallas",   # 'pallas' | 'int8'
    glue_dtype=jnp.bfloat16,
    softmax_mode: str = "onepass",
    interpret: bool = False,
    max_nb: int = 8,
    batched_core: bool = True,
) -> tuple[jax.Array, M.LSTMState]:
    """Batched camera->command step; same signature family as
    quant.int8_forward / quant.pallas_forward (jit with params/int_params/
    tail as arguments). The integer encoder region is bit-identical to
    the golden path; everything around it is float glue."""
    b = frame.shape[0]
    if state is None:
        state = M.zero_state(cfg, b)
    f32 = jnp.float32
    gd = glue_dtype

    frame, quat = M.refine_inputs(cfg, frame, quat)

    # Tokenizer: factored operator GEMMs in the glue dtype, f32 accum.
    tokens = L.tokenizer_tokens_factored(
        frame, params["tokenizer"], cfg, dtype=gd
    )

    # Encoder: the bit-exact int8 region.
    if encoder == "pallas":
        from ..ops.pallas.ita_kernel import ita_encoder_block

        # Tokenizer LN fuses into the kernel (pre_ln) and the kernel
        # reads/writes the glue dtype directly — same math as the XLA
        # LN + f32 kernel I/O + post-cast (LN stays f32 in-kernel), at
        # half the kernel-boundary HBM traffic. The explicit glue-dtype
        # cast here is what realizes the input-side halving (the factored
        # tokenizer's bias add returns f32): 2x 42 us layout copies
        # measured at the kernel boundary in f32 at b1024.
        x = tokens.astype(gd)
        for i in range(cfg.num_layers):
            blk = params["blocks"][i]
            x = ita_encoder_block(
                x, int_params["attn"][i], int_params["ffn"][i],
                blk["ln1"], blk["ln2"],
                interpret=interpret, softmax_mode=softmax_mode,
                max_nb=max_nb, batched_core=batched_core,
                pre_ln=params["tokenizer"]["ln"] if i == 0 else None,
                out_dtype=gd if i == cfg.num_layers - 1 else None,
            )
    elif encoder == "int8":
        tokens = L.layer_norm(tokens, params["tokenizer"]["ln"])  # f32
        from ..ops.integer_ita import ita_attention_f32, ita_ffn_f32

        x = tokens
        for i in range(cfg.num_layers):
            blk = params["blocks"][i]
            a = jax.vmap(
                lambda s: ita_attention_f32(
                    s, int_params["attn"][i], softmax_mode=softmax_mode
                )
            )(x)
            x = L.layer_norm(x + a, blk["ln1"])
            f = jax.vmap(lambda s: ita_ffn_f32(s, int_params["ffn"][i]))(x)
            x = L.layer_norm(x + f, blk["ln2"])
    else:
        raise ValueError(encoder)

    # Fusion + decoder: one composed GEMM (K = S*E).
    dec = jax.lax.dot_general(
        x.reshape(b, cfg.S * cfg.E).astype(tail.w.dtype), tail.w,
        (((1,), (0,)), ((), ())), preferred_element_type=f32,
    ) + tail.b

    # LSTM + head in the glue dtype (state stays f32 at the boundary).
    demote = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(gd) if a.dtype == f32 else a, t
    )
    feat = jnp.concatenate([dec, vel / 10.0, quat.astype(f32)], axis=1)
    y, (h, c) = L.lstm_forward(
        feat.astype(gd), M.LSTMState(*demote(tuple(state))),
        demote(params["lstm"]), 0.0, None,
    )
    head = params["fc2"]
    # Gate on cfg.spectral_norm_decoder exactly like M.forward
    # (vit_lstm.py:275): init_params creates u/v unconditionally, so the
    # presence of "u" alone must not trigger normalization — configs with
    # spectral_norm_decoder=False (ITA base) use the raw head weight.
    if cfg.spectral_norm_decoder and "u" in head:
        w_sn, _, _ = L.spectral_norm_weight(
            head["w"], head["u"], head["v"], update=False
        )
    else:
        w_sn = head["w"]
    cmd = jax.lax.dot_general(
        y.astype(gd), w_sn.astype(gd), (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + head["b"]
    to32 = lambda t: jax.tree_util.tree_map(lambda a: a.astype(f32), t)
    return cmd, M.LSTMState(to32(h), to32(c))
