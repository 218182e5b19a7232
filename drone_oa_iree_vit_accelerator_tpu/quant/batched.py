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


class TailMatrixT(NamedTuple):
    """A tail whose rows are in (e*S + s) order — the layout the
    TRANSPOSED turbo pipeline (encoder='pallas_T') flattens to. A
    distinct type so a mismatched tail/encoder pairing fails loudly at
    trace time instead of silently decoding garbage."""

    w: jax.Array  # (E*S, decoder_out), e-major rows
    b: jax.Array  # (decoder_out,)


def make_tail(cfg: ModelConfig, params: dict,
              dtype=jnp.bfloat16, e_major: bool = False) -> TailMatrix:
    """Build the precomposed fusion+decoder matrix for the turbo path.

    For FLATTEN-fusion configs (ITA base / single_layer / upsample_
    shuffle) the fusion is the identity reshape, so the tail IS the
    (frozen) decoder weight.

    ``e_major=True`` permutes the rows from the (s*E + e) token-flatten
    order to (e*S + s) — the order the TRANSPOSED encoder pipeline
    (encoder='pallas_T') reaches with a tile-cheap major-axis transpose
    instead of a minor-axis relayout. Values are identical; build the
    tail to match the encoder layout you deploy."""
    if cfg.fusion is FusionKind.FLATTEN:
        fp = M.freeze_for_inference(cfg, params)
        dec = fp["decoder"]
        w, b = dec["w"], dec["b"]
    else:
        w, b = M.make_tail_matrix(cfg, params)
    if e_major:
        w = (
            w.reshape(cfg.S, cfg.E, w.shape[-1])
            .transpose(1, 0, 2)
            .reshape(cfg.S * cfg.E, w.shape[-1])
        )
        return TailMatrixT(w=w.astype(dtype), b=b.astype(jnp.float32))
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
    encoder: str = "pallas",   # 'pallas' | 'pallas_T' | 'int8'
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

    if isinstance(tail, TailMatrixT) and encoder != "pallas_T":
        raise ValueError(
            "e-major tail (make_tail e_major=True) requires "
            f"encoder='pallas_T', got encoder={encoder!r}"
        )

    # Encoder: the bit-exact int8 region.
    if encoder == "pallas_T":
        # Fully transposed pipeline: tokens (E, B*S) straight from the
        # stage-3 tokenizer GEMM, the channels-on-sublanes kernel (full
        # 128-lane VPU occupancy on every glue/requant/LN pass — see
        # encoder_core_batched_T), and an e-major tail whose (B, E*S)
        # operand needs only a tile-cheap major-axis transpose.
        # Measured (docs/turbo_T_report.json, v5e device traces, b1024):
        # 916 -> 764 us/step onepass (1.340 M fps), 949 -> 791 streaming.
        # Build the tail with make_tail(..., e_major=True); a row-major
        # TailMatrix is accepted but row-permuted per call (correct,
        # slower — an 8 MB gather inside jit).
        from ..ops.pallas.ita_kernel import ita_encoder_block_T

        if not isinstance(tail, TailMatrixT):
            tail = TailMatrixT(
                w=tail.w.reshape(cfg.S, cfg.E, -1)
                .transpose(1, 0, 2)
                .reshape(cfg.S * cfg.E, -1),
                b=tail.b,
            )

        xT = L.tokenizer_tokens_factored_T(
            frame, params["tokenizer"], cfg, dtype=gd
        ).astype(gd)
        for i in range(cfg.num_layers):
            blk = params["blocks"][i]
            xT = ita_encoder_block_T(
                xT, int_params["attn"][i], int_params["ffn"][i],
                blk["ln1"], blk["ln2"],
                seq=cfg.S, interpret=interpret, softmax_mode=softmax_mode,
                max_nb=max_nb,
                pre_ln=params["tokenizer"]["ln"] if i == 0 else None,
                out_dtype=gd if i == cfg.num_layers - 1 else None,
            )
        x = (
            xT.reshape(cfg.E, b, cfg.S)
            .transpose(1, 0, 2)          # minor dim unchanged: tile copy
            .reshape(b, cfg.E * cfg.S)   # e-major flatten (matches tail)
        )
        dec = jax.lax.dot_general(
            x.astype(tail.w.dtype), tail.w,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ) + tail.b
        return _turbo_head(
            cfg, params, dec, vel, quat, state, gd=gd, f32=f32
        )
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
    return _turbo_head(cfg, params, dec, vel, quat, state, gd=gd, f32=f32)


def _turbo_head(cfg, params, dec, vel, quat, state, *, gd, f32):
    """LSTM + spectral-norm head in the glue dtype (state stays f32 at
    the boundary) — shared by the row-major and transposed turbo
    pipelines."""
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
