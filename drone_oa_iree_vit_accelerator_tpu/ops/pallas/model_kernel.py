"""Whole-model Pallas megakernel: camera frame -> velocity command, one
pallas_call (plus the patchify conv in XLA).

Round-1 verdict: the fused encoder kernel alone *lost* to plain XLA at
batch 1 (the latency operating point the reference cares about) because
the model tail — fusion, the 4608x512 decoder, the 3-layer LSTM, the
head — dominates a single-frame step (~16-23 us of the ~25-32 us total,
measured by device-trace component profiling), and at 1.7 M params the
whole step is HBM-bandwidth-bound: latency ~= bytes(weights)/BW + glue.

This kernel is the TPU-native fix. Everything after the tokenizer's
conv+resize runs as ONE pallas_call —

    pre-LN tokens (S,E) ── LayerNorm ──
    int8 encoder layer (encoder_core, bit-exact ITA) ──
    pixel-shuffle ⊕ bilinear-upsample ⊕ 3x3 conv fusion ── decoder ──
    concat[vel/10, quat] ── 3-layer LSTM ── head ── velocity postprocess

— with the decoder weight AND the LSTM weights packed into one
grid-blocked operand (grid=(4,): 3 decoder channel-groups + 1 LSTM
block) so their HBM->VMEM DMA overlaps compute instead of serializing in
the prefill; Pallas double-buffers the next block while the current step
computes. The patchify conv and bilinear resize stay in XLA: their
layouts are fast there, and moving them in-kernel measured 15 us of
stranded-conv + layout-copy cost on the XLA side (the kernel boundary
wants a plain (S, E) operand). Float glue weights are stored bf16 (the
reference deploys the whole float part f16:
--iree-input-demote-f32-to-f16,
samples/inference_udp_FPGA_custom_dispatch/CMakeLists.txt:15-33); the
integer region is bit-identical to ops/integer_ita.py either way.

The fusion stage is computed in TRANSPOSED orientation (channels on
sublanes, the 16x32 spatial grid on lanes) so that every step is a small
MXU matmul or a lane-shift, and the conv output lands directly in the
NCHW flatten order the decoder expects — zero in-kernel relayouts:

    pixel-shuffle: sh = Σ_off G_off @ y^T @ P_off   (0/1 selection mats)
    upsample:      up = y^T @ U            (U = kron of interp matrices)
    3x3 conv:      out^T = Σ_tap K_tap @ mask(lane_shift(fused^T))
    decoder:       dec = Σ_c out^T[c] @ Wdec[c*512:(c+1)*512]  (blocked)

The fusion conv bias is folded into the decoder bias offline (it
contributes a constant vector through the linear decoder): dec_b_eff =
dec_b + Σ_c conv_b[c] * Wdec_c.sum(rows).

Reference scope anchor: this single kernel covers reference
model.py:86-138 (encoder, fusion, decoder, LSTM, head) +
main.cpp:381-417 (calculate_final_velocity) for the flagship
ITA_single_layer_upsample_shuffle config.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.image import _interp_matrix
from .ita_kernel import (
    N_ISCALARS,
    _layer_norm,
    encoder_core,
    encoder_core_batched,
    pack_block_scalars,
)

# fscal layout: encoder scales 0..3 (ita_kernel._FS_*), then serve scalars.
_FS_VEL, _FS_POSX = 4, 5
N_FSCALARS8 = 8

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

# Row layout of the LSTM block (wpack[3]); dec part of w_ih0 first.
_L_IH0A, _L_HH0 = 0, 512
_L_IH1, _L_HH1 = 640, 768
_L_IH2, _L_HH2 = 896, 1024
_L_IH0B = 1152  # 5 rows: the [vel/10, quat] part of w_ih0
_WPACK_ROWS = 1536  # = one decoder channel-group (3 * 512)

# Row layout of the per-output-column dequant scales (wscale).
_S_DEC, _S_IH0A, _S_IH0B, _S_HH0 = 0, 1, 2, 3
_S_IH1, _S_HH1, _S_IH2, _S_HH2 = 4, 5, 6, 7


class FlagshipKernelParams(NamedTuple):
    """Precomputed device arrays for the megakernel (one per model)."""

    tok: dict             # tokenizer params; conv+resize run in XLA
    iscal: jax.Array      # (1, 20) i32 — encoder requant params
    fscal: jax.Array      # (1, 4) f32 — encoder quant scales
    enc: tuple            # 16 encoder weight/bias/LN arrays (ita_kernel order)
    tokg: jax.Array       # (1, 64) f32 — tokenizer LN gain
    tokb: jax.Array       # (1, 64) f32 — tokenizer LN bias
    gsel: jax.Array       # (4, 16, 64) f32 — pixel-shuffle channel selects
    psel: jax.Array       # (4, 128, 512) bf16 — pixel-shuffle spatial places
    umat: jax.Array       # (128, 512) f32 — bilinear upsample (kron)
    ktaps: jax.Array      # (9, 9, 80) f32 — conv taps [tap, out_ch, in_ch]
    masks: jax.Array      # (9, 512) f32 — conv boundary masks per tap
    wpack: jax.Array      # (4, 1536, 512) i8/bf16 — 3 decoder groups + LSTM
    wscale: jax.Array     # (8, 512) f32 — per-output-column dequant scales
    bdec: jax.Array       # (1, 512) f32 — decoder bias + folded conv bias
    b0: jax.Array         # (1, 512) f32 — lstm-0 b_ih + b_hh folded
    b1: jax.Array
    b2: jax.Array
    whead: jax.Array      # (128, 3) f32
    bhead: jax.Array      # (1, 3) f32


def make_flagship_kernel_params(
    cfg, params, int_params, glue_quant: str = "int8"
) -> FlagshipKernelParams:
    """Precompute all megakernel operands from model + int8 params.

    Call once at engine build; the result is a pytree of device arrays to
    pass through the jit boundary. Spectral norm is baked
    (models/vit_lstm.freeze_for_inference semantics) if still present.

    ``glue_quant``: storage format of the decoder/LSTM weight pack, the
    dominant HBM stream of a batch-1 step (6.3 MB bf16):

    - ``"int8"`` (default): per-output-column symmetric int8 with the
      dequant applied to the (1, 512) matmul RESULT — numerically
      identical to dequantizing the weights, at half the bytes. This is
      the reference's ARM deployment scheme for exactly these linears
      (tests/p2e_backup/ita_quantization_specs.py:47-67,
      per_channel_symmetric weights), applied where TPU serving is
      bandwidth-bound.
    - ``"bf16"``: plain demoted weights (the f16-deploy analog).
    """
    if glue_quant not in ("int8", "bf16"):
        raise ValueError(glue_quant)
    from ...core.config import FusionKind
    from ...models import vit_lstm as M

    if (
        cfg.num_layers != 1
        or cfg.H != 1
        or cfg.fusion is not FusionKind.PXSHUFFLE_UPSAMPLE
        or (cfg.S, cfg.E) != (128, 64)
    ):
        raise NotImplementedError(
            f"megakernel supports the flagship config only, got {cfg.name}"
        )
    params = M.freeze_for_inference(cfg, params)

    attn, ffn = int_params["attn"][0], int_params["ffn"][0]
    iscal, fscal = pack_block_scalars(attn, ffn)
    blk = params["blocks"][0]
    f32 = lambda t: jnp.asarray(t, jnp.float32)
    enc = (
        attn.q.w, attn.q.b[None, :],
        attn.k.w, attn.k.b[None, :],
        attn.v.w, attn.v.b[None, :],
        attn.o.w, attn.o.b[None, :],
        ffn.fc1.w, ffn.fc1.b[None, :],
        ffn.fc2.w, ffn.fc2.b[None, :],
        f32(blk["ln1"]["g"])[None, :], f32(blk["ln1"]["b"])[None, :],
        f32(blk["ln2"]["g"])[None, :], f32(blk["ln2"]["b"])[None, :],
    )

    th, tw = cfg.token_hw            # (8, 16)
    fh, fw = cfg.fusion_hw           # (16, 32)
    e = cfg.E
    # Pixel-shuffle (torch convention c = c_out*r^2 + dy*r + dx, r=2).
    gsel = np.zeros((4, e // 4, e), np.float32)
    psel = np.zeros((4, th * tw, fh * fw), np.float32)
    for off, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        for co in range(e // 4):
            gsel[off, co, co * 4 + off] = 1.0
        for h in range(th):
            for w in range(tw):
                psel[off, h * tw + w, (2 * h + dy) * fw + (2 * w + dx)] = 1.0
    # Bilinear upsample as one (th*tw, fh*fw) matrix (align_corners=True,
    # matching fuse_tokens_nhwc / utils.image.bilinear_resize).
    mh = np.asarray(_interp_matrix(th, fh, True))  # (fh, th)
    mw = np.asarray(_interp_matrix(tw, fw, True))  # (fw, tw)
    umat = np.einsum("Hh,Ww->hwHW", mh, mw).reshape(th * tw, fh * fw)

    # Conv taps + boundary masks (3x3, pad 1, over the (fh, fw) grid).
    cw = np.asarray(params["fusion"]["conv"]["w"], np.float32)  # (9, 80, 3, 3)
    cb = np.asarray(params["fusion"]["conv"]["b"], np.float32)  # (9,)
    ktaps = np.stack(
        [cw[:, :, dy + 1, dx + 1] for dy, dx in _TAPS]
    )  # (9, 9, 80)
    hh, ww = np.divmod(np.arange(fh * fw), fw)
    masks = np.stack(
        [
            ((hh + dy >= 0) & (hh + dy < fh) & (ww + dx >= 0) & (ww + dx < fw))
            for dy, dx in _TAPS
        ]
    ).astype(np.float32)  # (9, 512)

    dec_w = np.asarray(params["decoder"]["w"], np.float32)  # (4608, 512)
    nchan = cfg.fusion_out_channels  # 9
    dout = cfg.decoder_out           # 512
    wdec = dec_w.reshape(nchan, fh * fw, dout)
    # Fold the conv bias through the decoder (constant contribution).
    bdec = (
        np.asarray(params["decoder"]["b"], np.float32)
        + np.einsum("c,chd->d", cb, wdec)
    )[None, :]

    # Pack decoder groups + the whole LSTM into one grid-blocked operand:
    # blocks 0..2 = 3 decoder channels each; block 3 = LSTM weights. The
    # block DMAs then pipeline behind compute instead of serializing in
    # the kernel prefill.
    lstm = params["lstm"]
    w_ih0 = np.asarray(lstm[0]["w_ih"], np.float32)  # (517, 512)
    wpack = np.zeros((4, _WPACK_ROWS, dout), np.float32)
    for g in range(3):
        wpack[g] = wdec[3 * g : 3 * g + 3].reshape(_WPACK_ROWS, dout)
    wpack[3, _L_IH0A:_L_IH0A + 512] = w_ih0[:dout]
    wpack[3, _L_HH0:_L_HH0 + 128] = np.asarray(lstm[0]["w_hh"], np.float32)
    wpack[3, _L_IH1:_L_IH1 + 128] = np.asarray(lstm[1]["w_ih"], np.float32)
    wpack[3, _L_HH1:_L_HH1 + 128] = np.asarray(lstm[1]["w_hh"], np.float32)
    wpack[3, _L_IH2:_L_IH2 + 128] = np.asarray(lstm[2]["w_ih"], np.float32)
    wpack[3, _L_HH2:_L_HH2 + 128] = np.asarray(lstm[2]["w_hh"], np.float32)
    wpack[3, _L_IH0B:_L_IH0B + 5] = w_ih0[dout:]

    # Per-output-column dequant scales. Row 0: the decoder (one scale per
    # output column, shared by all three row-blocks — a column spans the
    # full 4608 rows). Rows 1..7: one per LSTM weight piece (each piece is
    # its own matmul, so its columns get independent scales).
    pieces = (
        (_S_IH0A, _L_IH0A, 512), (_S_IH0B, _L_IH0B, 5), (_S_HH0, _L_HH0, 128),
        (_S_IH1, _L_IH1, 128), (_S_HH1, _L_HH1, 128),
        (_S_IH2, _L_IH2, 128), (_S_HH2, _L_HH2, 128),
    )
    wscale = np.ones((8, dout), np.float32)
    if glue_quant == "int8":
        def colq(w):  # (rows, 512) -> (int8 rows, scale per column)
            s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
            return np.clip(np.rint(w / s), -127, 127), s

        # Quantize the decoder over its FULL column (all 3 blocks): stack
        # block rows back into (4608, 512) column space.
        dec_full = np.concatenate([wpack[g] for g in range(3)], axis=0)
        q, s = colq(dec_full)
        wscale[_S_DEC] = s
        for g in range(3):
            wpack[g] = q[g * _WPACK_ROWS : (g + 1) * _WPACK_ROWS]
        for srow, r0, nrows in pieces:
            q, s = colq(wpack[3, r0 : r0 + nrows])
            wscale[srow] = s
            wpack[3, r0 : r0 + nrows] = q
        wpack_dev = jnp.asarray(wpack, jnp.int8)
    else:
        wpack_dev = jnp.asarray(wpack, jnp.bfloat16)

    bf16 = lambda t: jnp.asarray(t, jnp.bfloat16)
    return FlagshipKernelParams(
        tok=jax.tree_util.tree_map(jnp.asarray, params["tokenizer"]),
        iscal=iscal, fscal=fscal, enc=enc,
        tokg=f32(params["tokenizer"]["ln"]["g"])[None, :],
        tokb=f32(params["tokenizer"]["ln"]["b"])[None, :],
        gsel=jnp.asarray(gsel), psel=bf16(psel),
        umat=jnp.asarray(umat, jnp.float32),
        ktaps=jnp.asarray(ktaps), masks=jnp.asarray(masks),
        wpack=wpack_dev, wscale=jnp.asarray(wscale), bdec=jnp.asarray(bdec),
        b0=jnp.asarray(lstm[0]["b_ih"] + lstm[0]["b_hh"], jnp.float32)[None, :],
        b1=jnp.asarray(lstm[1]["b_ih"] + lstm[1]["b_hh"], jnp.float32)[None, :],
        b2=jnp.asarray(lstm[2]["b_ih"] + lstm[2]["b_hh"], jnp.float32)[None, :],
        whead=jnp.asarray(params["fc2"]["w"], jnp.float32),
        bhead=jnp.asarray(params["fc2"]["b"], jnp.float32)[None, :],
    )


def _lane_shift(x: jax.Array, d: int) -> jax.Array:
    """x[:, j] -> x[:, j+d] with zero fill (static d; lane axis)."""
    if d == 0:
        return x
    r, c = x.shape
    if d > 0:
        return jnp.concatenate(
            [x[:, d:], jnp.zeros((r, d), x.dtype)], axis=1
        )
    return jnp.concatenate([jnp.zeros((r, -d), x.dtype), x[:, :d]], axis=1)


def _fusion_transposed(y_t, gsel, psel, umat, ktaps, masks, fw):
    """Encoder output (transposed, (E, S)) -> conv output (9, fh*fw).

    Shared by the kernel and the pure-jnp mirror: pixel-shuffle +
    upsample as matmuls, the 3x3 conv as masked lane-shifts + tap
    matmuls. Conv bias folded into the decoder bias upstream.
    """
    f32 = jnp.float32
    sh = None
    for off in range(4):
        part = jnp.dot(
            jnp.dot(gsel[off], y_t, preferred_element_type=f32).astype(
                psel.dtype
            ),
            psel[off], preferred_element_type=f32,
        )  # (E/4, fh*fw)
        sh = part if sh is None else sh + part
    up = jnp.dot(y_t, umat, preferred_element_type=f32)
    fused = jnp.concatenate([sh, up], axis=0)  # (E/4+E, fh*fw)

    acc = None
    for t, (dy, dx) in enumerate(_TAPS):
        shifted = _lane_shift(fused, dy * fw + dx) * masks[t][None, :]
        term = jnp.dot(ktaps[t], shifted, preferred_element_type=f32)
        acc = term if acc is None else acc + term
    return acc  # (9, fh*fw)


def _lstm_cell(gates, h, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new


def _lstm_head_postprocess(
    dec, wblk, wscale, b0, b1, b2, whead, bhead, extra, h, c,
    desired_vel, pos_x
):
    """dec (1,512) + LSTM block rows -> (cmd (3,), 3x h' (1,128), 3x c').

    Shared by kernel and mirror. ``wblk`` is the packed (1536, 512)
    int8/bf16 LSTM block (row layout _L_*); ``wscale`` the (8, 512)
    per-output-column dequant scales (ones in bf16 mode) applied to each
    matmul RESULT; ``extra`` is (1, 5) = [vel/10, quat]; ``h``/``c`` are
    (3, 1, 128) — the serve-state layout, no reshapes at the boundary.
    """
    f32, bf = jnp.float32, jnp.bfloat16

    def wdot(x, r0, nrows, srow):
        y = jnp.dot(
            x.astype(bf), wblk[r0 : r0 + nrows].astype(bf),
            preferred_element_type=f32,
        )
        return y * wscale[srow][None, :]

    g0 = (
        wdot(dec, _L_IH0A, 512, _S_IH0A)
        + wdot(extra, _L_IH0B, 5, _S_IH0B)
        + wdot(h[0], _L_HH0, 128, _S_HH0)
        + b0[0]
    )
    h0, c0 = _lstm_cell(g0, h[0], c[0])
    g1 = wdot(h0, _L_IH1, 128, _S_IH1) + wdot(h[1], _L_HH1, 128, _S_HH1) + b1[0]
    h1, c1 = _lstm_cell(g1, h[1], c[1])
    g2 = wdot(h1, _L_IH2, 128, _S_IH2) + wdot(h[2], _L_HH2, 128, _S_HH2) + b2[0]
    h2, c2 = _lstm_cell(g2, h[2], c[2])
    cmd = jnp.dot(h2, whead, preferred_element_type=f32) + bhead[0]

    # Velocity post-processing (pipeline/serve.postprocess_velocity).
    vx = jnp.clip(cmd[0, 0], -1.0, 1.0)
    vy, vz = cmd[0, 1], cmd[0, 2]
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    scale = jnp.where(norm > 0, desired_vel / norm, desired_vel)
    vx_n, vy_n, vz_n = vx * scale, vy * scale, vz * scale
    vx_floor = jnp.maximum(1.0, pos_x / 2.0 * desired_vel)
    vx_out = jnp.where(pos_x < 2.0, vx_floor, vx_n)
    out = jnp.concatenate([vx_out[None], vy_n[None], vz_n[None]])
    return out, (h0, h1, h2), (c0, c1, c2)


def _megakernel(
    softmax_mode,   # static
    seq, e, fw,     # static dims: S, E, fused spatial width
    iscal_ref,      # SMEM (1, 20) i32
    fscal_ref,      # SMEM (1, 8) f32: encoder scales + [vel, pos_x]
    x_ref,          # VMEM (S, E) f32 — pre-LN tokens (conv+resize in XLA)
    tokg_ref, tokb_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
    ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,
    gsel_ref, psel_ref, umat_ref, ktaps_ref, masks_ref,
    wpack_ref,      # VMEM (1, 1536, 512) i8/bf16 — this step's block
    wscale_ref,     # VMEM (8, 512) f32 — per-output-column dequant scales
    bdec_ref, b0_ref, b1_ref, b2_ref, whead_ref, bhead_ref,
    quat_ref,       # VMEM (1, 4) f32
    h_ref, c_ref,   # VMEM (3, 1, 128) f32 — native serve-state layout
    cmd_ref, h_out_ref, c_out_ref,   # outputs
    outT_ref,       # scratch VMEM (3, 8, fh*fw) f32 — conv out, 3 ch/plane
    dec_ref,        # scratch VMEM (1, 512) f32 — decoder accumulator
):
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _tokenize_encode_fuse():
        # Tokenizer LN (the conv/resize prefix stays in XLA, where its
        # layouts are fast; moving them in-kernel measured 15 us of
        # stranded-conv + layout-copy cost on the XLA side).
        tokens = _layer_norm(x_ref[...], tokg_ref[0], tokb_ref[0])  # (S, E)
        xe = encoder_core(
            tokens, softmax_mode, 1, seq, iscal_ref, fscal_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
            ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,
        )  # (S, E)
        y_t = jnp.transpose(
            xe.reshape(1, seq, e), (0, 2, 1)
        ).reshape(e, seq)  # (E, S): channels on sublanes, tokens on lanes
        acc = _fusion_transposed(
            y_t, gsel_ref[...], psel_ref[...], umat_ref[...],
            ktaps_ref[...], masks_ref[...], fw,
        )
        # Scratch is (3 groups, 8, fh*fw): 3 conv channels per 8-row-
        # aligned plane so the per-step read below is a free leading-dim
        # index (Mosaic rejects unaligned dynamic sublane offsets).
        for g in range(3):
            outT_ref[g, :3, :] = acc[g * 3 : (g + 1) * 3]
        dec_ref[...] = bdec_ref[...]

    # Decoder: steps 0..2 contract this step's 3 channel-slices of W
    # (DMA'd while the previous step computed) with the conv-output rows.
    @pl.when(i < 3)
    def _decoder_group():
        grp = outT_ref[jnp.minimum(i, 2), :3, :]  # (3, fh*fw) f32
        wblk = wpack_ref[0]                       # (1536, 512) i8/bf16
        part = None
        for j in range(3):
            term = jnp.dot(
                grp[j][None, :].astype(jnp.bfloat16),
                wblk[j * 512 : (j + 1) * 512].astype(jnp.bfloat16),
                preferred_element_type=f32,
            )
            part = term if part is None else part + term
        # One decoder column spans all three blocks -> same scale row.
        dec_ref[...] += part * wscale_ref[_S_DEC][None, :]

    @pl.when(i == 3)
    def _tail():
        desired_vel = fscal_ref[0, _FS_VEL]
        extra = jnp.concatenate(
            [(desired_vel / 10.0).reshape(1, 1), quat_ref[...]], axis=1
        )  # (1, 5)
        cmd, hs, cs = _lstm_head_postprocess(
            dec_ref[...], wpack_ref[0], wscale_ref[...],
            b0_ref[...], b1_ref[...], b2_ref[...],
            whead_ref[...], bhead_ref[...],
            extra, h_ref[...], c_ref[...],
            desired_vel, fscal_ref[0, _FS_POSX],
        )
        cmd_ref[0] = cmd
        for layer in range(3):
            h_out_ref[layer] = hs[layer]
            c_out_ref[layer] = cs[layer]


def _lstm_head_postprocess_rows(
    dec, wblk, wscale, b0, b1, b2, whead, bhead, extra, h, c,
    desired_vel, pos_x
):
    """Batched twin of _lstm_head_postprocess: dec (K, 512), extra
    (K, 5), h/c (3, K, 128), desired_vel/pos_x (K, 1) -> (cmd (K, 3),
    3x h' (K, 128), 3x c'). Identical math per row (the fleet serves K
    independent drones; the LSTM/head GEMMs just gain K MXU rows); the
    velocity postprocess is pipeline/serve.postprocess_velocity
    vectorized on (K, 1) columns."""
    f32, bf = jnp.float32, jnp.bfloat16

    def wdot(x, r0, nrows, srow):
        y = jnp.dot(
            x.astype(bf), wblk[r0 : r0 + nrows].astype(bf),
            preferred_element_type=f32,
        )
        return y * wscale[srow][None, :]

    g0 = (
        wdot(dec, _L_IH0A, 512, _S_IH0A)
        + wdot(extra, _L_IH0B, 5, _S_IH0B)
        + wdot(h[0], _L_HH0, 128, _S_HH0)
        + b0[0]
    )
    h0, c0 = _lstm_cell(g0, h[0], c[0])
    g1 = wdot(h0, _L_IH1, 128, _S_IH1) + wdot(h[1], _L_HH1, 128, _S_HH1) + b1[0]
    h1, c1 = _lstm_cell(g1, h[1], c[1])
    g2 = wdot(h1, _L_IH2, 128, _S_IH2) + wdot(h[2], _L_HH2, 128, _S_HH2) + b2[0]
    h2, c2 = _lstm_cell(g2, h[2], c[2])
    cmd = jnp.dot(h2, whead, preferred_element_type=f32) + bhead[0]  # (K, 3)

    vx = jnp.clip(cmd[:, 0:1], -1.0, 1.0)
    vy, vz = cmd[:, 1:2], cmd[:, 2:3]
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    scale = jnp.where(norm > 0, desired_vel / norm, desired_vel)
    vx_n, vy_n, vz_n = vx * scale, vy * scale, vz * scale
    vx_floor = jnp.maximum(1.0, pos_x / 2.0 * desired_vel)
    vx_out = jnp.where(pos_x < 2.0, vx_floor, vx_n)
    out = jnp.concatenate([vx_out, vy_n, vz_n], axis=1)  # (K, 3)
    return out, (h0, h1, h2), (c0, c1, c2)


def _megakernel_fleet(
    softmax_mode,   # static
    k, seq, e, fw,  # static dims: fleet capacity K, S, E, fusion width
    iscal_ref,      # SMEM (1, 20) i32
    fscal_ref,      # SMEM (1, 4) f32 — encoder quant scales only
    x_ref,          # VMEM (K, S, E) f32 — pre-LN tokens, K frames
    tokg_ref, tokb_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
    ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,
    gsel_ref, psel_ref, umat_ref, ktaps_ref, masks_ref,
    wpack_ref,      # VMEM (1, 1536, 512) i8/bf16 — this step's block
    wscale_ref,     # VMEM (8, 512) f32
    bdec_ref, b0_ref, b1_ref, b2_ref, whead_ref, bhead_ref,
    quat_ref,       # VMEM (K, 4) f32
    vel_ref,        # VMEM (K, 1) f32 — per-drone desired velocity
    posx_ref,       # VMEM (K, 1) f32
    h_ref, c_ref,   # VMEM (3, K, 128) f32
    cmd_ref, h_out_ref, c_out_ref,
    outT_ref,       # scratch VMEM (9, K, fh*fw) f32 — conv out per channel
    dec_ref,        # scratch VMEM (K, 512) f32
):
    """Fleet megakernel: K drones per launch, same grid-(4,) weight
    streaming as _megakernel. The batch-1 megakernel amortizes nothing —
    a capacity-K fleet tick through it costs K x (fixed overhead +
    weight stream). Here the encoder runs the batched core (nb=K folded
    rows), the fusion loops per frame (its matmuls are per-frame by
    construction), and the decoder/LSTM GEMMs gain K MXU rows for free —
    the weight DMA (the b1 step's dominant cost) is paid ONCE for the
    whole fleet."""
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i == 0)
    def _tokenize_encode_fuse():
        x = x_ref[...].reshape(k * seq, e)
        tokens = _layer_norm(x, tokg_ref[0], tokb_ref[0])  # (K*S, E)
        xe = encoder_core_batched(
            tokens, softmax_mode, k, seq, iscal_ref, fscal_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
            ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,
        )  # (K*S, E)
        accs = []
        for kk in range(k):
            y_t = jnp.transpose(
                xe[kk * seq : (kk + 1) * seq], (1, 0)
            )  # (E, S)
            accs.append(
                _fusion_transposed(
                    y_t, gsel_ref[...], psel_ref[...], umat_ref[...],
                    ktaps_ref[...], masks_ref[...], fw,
                )
            )  # (9, fh*fw)
        for ch in range(9):
            outT_ref[ch] = jnp.concatenate(
                [accs[kk][ch : ch + 1] for kk in range(k)], axis=0
            )  # (K, fh*fw)
        dec_ref[...] = jnp.broadcast_to(bdec_ref[...], (k, 512))

    @pl.when(i < 3)
    def _decoder_group():
        wblk = wpack_ref[0]
        part = None
        for j in range(3):
            grp = outT_ref[jnp.minimum(i, 2) * 3 + j]  # (K, fh*fw)
            term = jnp.dot(
                grp.astype(jnp.bfloat16),
                wblk[j * 512 : (j + 1) * 512].astype(jnp.bfloat16),
                preferred_element_type=f32,
            )
            part = term if part is None else part + term
        dec_ref[...] += part * wscale_ref[_S_DEC][None, :]

    @pl.when(i == 3)
    def _tail():
        extra = jnp.concatenate(
            [vel_ref[...] / 10.0, quat_ref[...]], axis=1
        )  # (K, 5)
        cmd, hs, cs = _lstm_head_postprocess_rows(
            dec_ref[...], wpack_ref[0], wscale_ref[...],
            b0_ref[...], b1_ref[...], b2_ref[...],
            whead_ref[...], bhead_ref[...],
            extra, h_ref[...], c_ref[...],
            vel_ref[...], posx_ref[...],
        )
        cmd_ref[...] = cmd
        for layer in range(3):
            h_out_ref[layer] = hs[layer]
            c_out_ref[layer] = cs[layer]


@functools.partial(jax.jit, static_argnames=("interpret", "softmax_mode"))
def flagship_fused_step_fleet(
    kp: FlagshipKernelParams,
    tokens: jax.Array,       # (K, S, E) f32 — PRE-LN tokens per drone
    desired_vel: jax.Array,  # (K,) f32
    pos_x: jax.Array,        # (K,) f32
    quat: jax.Array,         # (K, 4) f32
    h: jax.Array,            # (3, K, 128) f32
    c: jax.Array,
    interpret: bool = False,
    softmax_mode: str = "onepass",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fleet-capacity megakernel step: K frames -> K POSTPROCESSED
    commands + states, ONE launch, one weight stream (same
    FlagshipKernelParams as the batch-1 step). K must be a multiple of 8
    (f32 sublane tile of the per-channel conv-output planes)."""
    k, seq, e = tokens.shape
    if k % 8 != 0:
        raise ValueError(f"fleet megakernel capacity {k} not a multiple of 8")
    fhw = kp.umat.shape[1]
    fw = 2 * 16

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    cmd, h_new, c_new = pl.pallas_call(
        functools.partial(_megakernel_fleet, softmax_mode, k, seq, e, fw),
        grid=(4,),
        in_specs=[
            smem((1, N_ISCALARS)),
            smem(kp.fscal.shape),
            const(tokens.shape),
            const(kp.tokg.shape), const(kp.tokb.shape),
            *[const(w.shape) for w in kp.enc],
            const(kp.gsel.shape), const(kp.psel.shape), const(kp.umat.shape),
            const(kp.ktaps.shape), const(kp.masks.shape),
            pl.BlockSpec(
                (1, _WPACK_ROWS, kp.wpack.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const(kp.wscale.shape),
            const(kp.bdec.shape),
            const(kp.b0.shape), const(kp.b1.shape), const(kp.b2.shape),
            const(kp.whead.shape), const(kp.bhead.shape),
            const((k, 4)), const((k, 1)), const((k, 1)),
            const(h.shape), const(c.shape),
        ],
        out_specs=(
            const((k, 3)), const(h.shape), const(c.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, 3), jnp.float32),
            jax.ShapeDtypeStruct(h.shape, jnp.float32),
            jax.ShapeDtypeStruct(c.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((9, k, fhw), jnp.float32),
            pltpu.VMEM((k, kp.wpack.shape[2]), jnp.float32),
        ],
        input_output_aliases={37: 1, 38: 2},
        interpret=interpret,
    )(
        kp.iscal, kp.fscal, tokens,
        kp.tokg, kp.tokb,
        *kp.enc,
        kp.gsel, kp.psel, kp.umat, kp.ktaps, kp.masks,
        kp.wpack, kp.wscale, kp.bdec,
        kp.b0, kp.b1, kp.b2,
        kp.whead, kp.bhead,
        quat,
        desired_vel.astype(jnp.float32)[:, None],
        pos_x.astype(jnp.float32)[:, None],
        h, c,
    )
    return cmd, h_new, c_new


def megakernel_reference(
    kp: FlagshipKernelParams,
    tokens_enc: jax.Array,   # (S, E) f32 — ENCODER OUTPUT tokens
    desired_vel,
    pos_x,
    quat: jax.Array,         # (1, 4) f32
    h: jax.Array,            # (3, 1, 128) f32
    c: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-jnp mirror of the kernel's fusion/decoder/LSTM math (same
    helpers, no Pallas) for testing: the kernel in interpret mode must
    match this near-exactly, while THIS function is checked against the
    composed model path at glue tolerance. Takes the encoder OUTPUT so
    the (separately verified) integer region stays out of the
    comparison."""
    f32, bf = jnp.float32, jnp.bfloat16
    y_t = tokens_enc.T  # (E, S)
    acc = _fusion_transposed(
        y_t, kp.gsel, kp.psel, kp.umat, kp.ktaps, kp.masks, 32
    )
    dec = kp.bdec
    for g in range(3):
        wblk = kp.wpack[g]
        part = None
        for j in range(3):
            term = jnp.dot(
                acc[g * 3 + j][None, :].astype(bf),
                wblk[j * 512 : (j + 1) * 512].astype(bf),
                preferred_element_type=f32,
            )
            part = term if part is None else part + term
        dec = dec + part * kp.wscale[_S_DEC][None, :]
    desired_vel = jnp.float32(desired_vel)
    extra = jnp.concatenate(
        [(desired_vel / 10.0).reshape(1, 1), quat], axis=1
    )
    cmd, hs, cs = _lstm_head_postprocess(
        dec, kp.wpack[3], kp.wscale, kp.b0, kp.b1, kp.b2, kp.whead, kp.bhead,
        extra, h, c, desired_vel, jnp.float32(pos_x),
    )
    return cmd, jnp.stack(hs), jnp.stack(cs)


@functools.partial(jax.jit, static_argnames=("interpret", "softmax_mode"))
def flagship_fused_step(
    kp: FlagshipKernelParams,
    tokens: jax.Array,       # (S, E) f32 — PRE-LN tokens (conv+resize XLA)
    desired_vel: jax.Array,  # scalar f32
    pos_x: jax.Array,        # scalar f32
    quat: jax.Array,         # (1, 4) f32
    h: jax.Array,            # (L, 1, 128) f32 — serve-state layout
    c: jax.Array,
    interpret: bool = False,
    softmax_mode: str = "onepass",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """pre-LN tokens -> (postprocessed cmd (3,), h', c'), ONE launch."""
    seq, e = tokens.shape
    fhw = kp.umat.shape[1]
    fw = 2 * 16  # fusion grid width (flagship token_hw -> fusion_hw)
    fscal8 = jnp.concatenate(
        [
            kp.fscal[0],
            jnp.stack([desired_vel, pos_x]).astype(jnp.float32),
            jnp.zeros((2,), jnp.float32),
        ]
    )[None, :]

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    cmd, h_new, c_new = pl.pallas_call(
        functools.partial(_megakernel, softmax_mode, seq, e, fw),
        grid=(4,),
        in_specs=[
            smem((1, N_ISCALARS)),
            smem((1, N_FSCALARS8)),
            const(tokens.shape),
            const(kp.tokg.shape), const(kp.tokb.shape),
            *[const(w.shape) for w in kp.enc],
            const(kp.gsel.shape), const(kp.psel.shape), const(kp.umat.shape),
            const(kp.ktaps.shape), const(kp.masks.shape),
            pl.BlockSpec(
                (1, _WPACK_ROWS, kp.wpack.shape[2]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            const(kp.wscale.shape),
            const(kp.bdec.shape),
            const(kp.b0.shape), const(kp.b1.shape), const(kp.b2.shape),
            const(kp.whead.shape), const(kp.bhead.shape),
            const((1, 4)),
            const(h.shape), const(c.shape),
        ],
        out_specs=(
            const((1, 3)), const(h.shape), const(c.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
            jax.ShapeDtypeStruct(h.shape, jnp.float32),
            jax.ShapeDtypeStruct(c.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, 8, fhw), jnp.float32),
            pltpu.VMEM((1, kp.wpack.shape[2]), jnp.float32),
        ],
        # The LSTM state updates in place (h -> h', c -> c'): aliasing
        # removes the per-call state copies XLA otherwise inserts around
        # the custom call (measured ~1 us/frame).
        input_output_aliases={35: 1, 36: 2},
        interpret=interpret,
    )(
        kp.iscal, fscal8, tokens,
        kp.tokg, kp.tokb,
        *kp.enc,
        kp.gsel, kp.psel, kp.umat, kp.ktaps, kp.masks,
        kp.wpack, kp.wscale, kp.bdec,
        kp.b0, kp.b1, kp.b2,
        kp.whead, kp.bhead,
        quat, h, c,
    )
    return cmd[0], h_new, c_new
