"""Whole-model Pallas megakernel for the FLATTEN zoo variants.

model_kernel.py covers the flagship (pixel-shuffle fusion); this kernel
covers the other three reference variants — ITA (base, 2 layers, E=128),
ITA_single_layer and ITA_upsample_shuffle — whose token fusion is a
plain flatten into a LARGE decoder (reference models/ITA/QAT/model.py:80:
tokens (B,S,E) -> (B, S*E) -> Linear(16384 or 8192 -> 512)). The base
2-layer E=128 shape is the reference's second deployed model
(tests/tuki.py:422 verifies it), and its serving profile is even more
HBM-bound than the flagship's: the 16384x512 decoder (33.5 MB f32) IS
the model — which is exactly where the megakernel argument applies.

Structure (one pallas_call after the XLA tokenizer conv+resize):

    grid = (G + 1,), wpack (G+1, 2048, 512) int8 (per-output-column
    symmetric, dequant on the matmul result — the reference's ARM
    per-channel deployment scheme, tests/p2e_backup/
    ita_quantization_specs.py:47-67):
      step 0      tokenizer LN -> num_layers x int8 encoder layer
                  (encoder_core, bit-exact ITA) -> tokens to scratch
      steps 0..G-1  decoder row-group g: 2048 rows of W (DMA'd while the
                  previous step computed) x the matching 2048/E token
                  rows; partial sums accumulate in scratch
      step G      3-layer LSTM + head + velocity postprocess
                  (_lstm_head_postprocess, shared with the flagship)

    G = S*E/2048: 8 groups at E=128, 4 at E=64 — each block's 1 MB DMA
    double-buffers behind the previous step's MXU work, so the decoder
    streams at HBM speed instead of serializing behind the encoder.

Bit-exactness: the integer encoder region is encoder_core — identical
to the flagship kernel and the jnp golden model. The float tail matches
models.vit_lstm composition to bf16-matmul tolerance (the reference
deploys its whole float part f16: --iree-input-demote-f32-to-f16).

Reference scope anchor: models/ITA/QAT/model.py:11-88 (encoder, flatten
decoder, LSTM, head) + main.cpp:381-417 (velocity postprocess).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ita_kernel import (
    N_ISCALARS,
    _layer_norm,
    encoder_core,
    pack_block_scalars,
)
from .model_kernel import (
    _L_HH0, _L_HH1, _L_HH2, _L_IH0A, _L_IH0B, _L_IH1, _L_IH2,
    _S_DEC, _S_HH0, _S_HH1, _S_HH2, _S_IH0A, _S_IH0B, _S_IH1, _S_IH2,
    _lstm_head_postprocess,
)

_BLOCK_ROWS = 2048  # decoder rows per grid step (= 2048/E token rows)
N_FSCAL = 8  # per-layer encoder scales (4) padded to a lane-friendly 8


class FlattenKernelParams(NamedTuple):
    """Precomputed device arrays for the FLATTEN megakernel."""

    tok: dict              # tokenizer params; conv+resize run in XLA
    iscals: tuple          # per layer: (1, 20) i32
    fscals: tuple          # per layer: (1, 8) f32 — encoder scales
    encs: tuple            # per layer: 16 weight/bias/LN arrays
    tokg: jax.Array        # (1, E) f32
    tokb: jax.Array        # (1, E) f32
    wpack: jax.Array       # (G+1, 2048, 512) i8/bf16 — decoder + LSTM
    wscale: jax.Array      # (8, 512) f32 — per-output-column dequant
    bdec: jax.Array        # (1, 512) f32
    b0: jax.Array          # (1, 512) f32 — lstm b_ih + b_hh folded
    b1: jax.Array
    b2: jax.Array
    whead: jax.Array       # (128, 3) f32
    bhead: jax.Array       # (1, 3) f32


def make_flatten_kernel_params(
    cfg, params, int_params, glue_quant: str = "int8"
) -> FlattenKernelParams:
    """Precompute megakernel operands for a FLATTEN-fusion config."""
    if glue_quant not in ("int8", "bf16"):
        raise ValueError(glue_quant)
    from ...core.config import FusionKind
    from ...models import vit_lstm as M

    if cfg.fusion is not FusionKind.FLATTEN:
        raise NotImplementedError(
            f"flatten megakernel needs FLATTEN fusion, got {cfg.name}; "
            "the flagship uses model_kernel.make_flagship_kernel_params"
        )
    if (cfg.S * cfg.E) % _BLOCK_ROWS != 0:
        raise NotImplementedError(f"S*E={cfg.S * cfg.E} % {_BLOCK_ROWS} != 0")
    params = M.freeze_for_inference(cfg, params)

    f32 = lambda t: jnp.asarray(t, jnp.float32)
    iscals, fscals, encs = [], [], []
    for i in range(cfg.num_layers):
        attn, ffn = int_params["attn"][i], int_params["ffn"][i]
        iscal, fscal = pack_block_scalars(attn, ffn)
        iscals.append(iscal)
        fscals.append(
            jnp.concatenate(
                [fscal, jnp.zeros((1, N_FSCAL - 4), jnp.float32)], axis=1
            )
        )
        blk = params["blocks"][i]
        encs.append((
            attn.q.w, attn.q.b[None, :],
            attn.k.w, attn.k.b[None, :],
            attn.v.w, attn.v.b[None, :],
            attn.o.w, attn.o.b[None, :],
            ffn.fc1.w, ffn.fc1.b[None, :],
            ffn.fc2.w, ffn.fc2.b[None, :],
            f32(blk["ln1"]["g"])[None, :], f32(blk["ln1"]["b"])[None, :],
            f32(blk["ln2"]["g"])[None, :], f32(blk["ln2"]["b"])[None, :],
        ))

    dout = cfg.decoder_out
    groups = (cfg.S * cfg.E) // _BLOCK_ROWS
    dec_w = np.asarray(params["decoder"]["w"], np.float32)  # (S*E, 512)
    lstm = params["lstm"]
    w_ih0 = np.asarray(lstm[0]["w_ih"], np.float32)  # (517, 512)

    wpack = np.zeros((groups + 1, _BLOCK_ROWS, dout), np.float32)
    for g in range(groups):
        wpack[g] = dec_w[g * _BLOCK_ROWS : (g + 1) * _BLOCK_ROWS]
    # LSTM block: same row layout as the flagship pack (model_kernel
    # _L_* constants; rows 1536..2047 stay zero).
    lb = wpack[groups]
    lb[_L_IH0A:_L_IH0A + 512] = w_ih0[:dout]
    lb[_L_HH0:_L_HH0 + 128] = np.asarray(lstm[0]["w_hh"], np.float32)
    lb[_L_IH1:_L_IH1 + 128] = np.asarray(lstm[1]["w_ih"], np.float32)
    lb[_L_HH1:_L_HH1 + 128] = np.asarray(lstm[1]["w_hh"], np.float32)
    lb[_L_IH2:_L_IH2 + 128] = np.asarray(lstm[2]["w_ih"], np.float32)
    lb[_L_HH2:_L_HH2 + 128] = np.asarray(lstm[2]["w_hh"], np.float32)
    lb[_L_IH0B:_L_IH0B + 5] = w_ih0[dout:]

    wscale = np.ones((8, dout), np.float32)
    if glue_quant == "int8":
        def colq(w):
            s = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
            return np.clip(np.rint(w / s), -127, 127), s

        q, s = colq(dec_w)
        wscale[_S_DEC] = s
        for g in range(groups):
            wpack[g] = q[g * _BLOCK_ROWS : (g + 1) * _BLOCK_ROWS]
        pieces = (
            (_S_IH0A, _L_IH0A, 512), (_S_IH0B, _L_IH0B, 5),
            (_S_HH0, _L_HH0, 128), (_S_IH1, _L_IH1, 128),
            (_S_HH1, _L_HH1, 128), (_S_IH2, _L_IH2, 128),
            (_S_HH2, _L_HH2, 128),
        )
        for srow, r0, nrows in pieces:
            q, s = colq(wpack[groups, r0 : r0 + nrows])
            wscale[srow] = s
            wpack[groups, r0 : r0 + nrows] = q
        wpack_dev = jnp.asarray(wpack, jnp.int8)
    else:
        wpack_dev = jnp.asarray(wpack, jnp.bfloat16)

    return FlattenKernelParams(
        tok=jax.tree_util.tree_map(jnp.asarray, params["tokenizer"]),
        iscals=tuple(iscals),
        fscals=jnp.asarray(fscals),
        encs=tuple(encs),
        tokg=f32(params["tokenizer"]["ln"]["g"])[None, :],
        tokb=f32(params["tokenizer"]["ln"]["b"])[None, :],
        wpack=wpack_dev,
        wscale=jnp.asarray(wscale),
        bdec=f32(params["decoder"]["b"])[None, :],
        b0=jnp.asarray(lstm[0]["b_ih"] + lstm[0]["b_hh"], jnp.float32)[None, :],
        b1=jnp.asarray(lstm[1]["b_ih"] + lstm[1]["b_hh"], jnp.float32)[None, :],
        b2=jnp.asarray(lstm[2]["b_ih"] + lstm[2]["b_hh"], jnp.float32)[None, :],
        whead=f32(params["fc2"]["w"]),
        bhead=f32(params["fc2"]["b"])[None, :],
    )


def _flatten_megakernel(
    softmax_mode,   # static
    num_layers, seq, e, heads, groups,  # static dims
    vp_ref,         # SMEM (1, 2) f32: [desired_vel, pos_x]
    *refs,
):
    """refs layout (in order):
    L x iscal SMEM (1,20); L x fscal SMEM (1,8); x (S,E); tokg; tokb;
    L x 16 encoder refs; wpack block (1, 2048, 512); wscale (8,512);
    bdec; b0; b1; b2; whead; bhead; quat (1,4); h (3,1,128); c;
    outputs: cmd (1,3); h_out; c_out; scratch: tok (S,E) f32; dec (1,512).
    """
    iscal_refs = refs[:num_layers]
    refs = refs[num_layers:]
    fscal_refs = refs[:num_layers]
    refs = refs[num_layers:]
    x_ref, tokg_ref, tokb_ref = refs[:3]
    refs = refs[3:]
    enc_refs = [refs[i * 16 : (i + 1) * 16] for i in range(num_layers)]
    refs = refs[num_layers * 16:]
    (wpack_ref, wscale_ref, bdec_ref, b0_ref, b1_ref, b2_ref,
     whead_ref, bhead_ref, quat_ref, h_ref, c_ref,
     cmd_ref, h_out_ref, c_out_ref, tok_ref, dec_ref) = refs

    i = pl.program_id(0)
    f32 = jnp.float32
    tpg = _BLOCK_ROWS // e  # token rows per decoder group

    @pl.when(i == 0)
    def _encode():
        x = _layer_norm(x_ref[...], tokg_ref[0], tokb_ref[0])  # (S, E)
        for l in range(num_layers):
            x = encoder_core(
                x, softmax_mode, 1, seq,
                iscal_refs[l], fscal_refs[l],
                *enc_refs[l], heads=heads,
            )
        tok_ref[...] = x
        dec_ref[...] = bdec_ref[...]

    @pl.when(i < groups)
    def _decoder_group():
        # Token rows [i*tpg, (i+1)*tpg) x decoder rows [i*2048, ...):
        # FLATTEN is token-major (vit_lstm.fuse_tokens: reshape(S*E)),
        # so token row j maps to decoder rows [j*E, (j+1)*E).
        slab = tok_ref[pl.ds(i * tpg, tpg), :]  # (tpg, E) f32; 8-aligned
        wblk = wpack_ref[0]                     # (2048, 512) i8/bf16
        part = None
        for j in range(tpg):
            term = jnp.dot(
                slab[j][None, :].astype(jnp.bfloat16),
                wblk[j * e : (j + 1) * e].astype(jnp.bfloat16),
                preferred_element_type=f32,
            )
            part = term if part is None else part + term
        dec_ref[...] += part * wscale_ref[_S_DEC][None, :]

    @pl.when(i == groups)
    def _tail():
        desired_vel = vp_ref[0, 0]
        extra = jnp.concatenate(
            [(desired_vel / 10.0).reshape(1, 1), quat_ref[...]], axis=1
        )
        cmd, hs, cs = _lstm_head_postprocess(
            dec_ref[...], wpack_ref[0], wscale_ref[...],
            b0_ref[...], b1_ref[...], b2_ref[...],
            whead_ref[...], bhead_ref[...],
            extra, h_ref[...], c_ref[...],
            desired_vel, vp_ref[0, 1],
        )
        cmd_ref[0] = cmd
        for layer in range(3):
            h_out_ref[layer] = hs[layer]
            c_out_ref[layer] = cs[layer]


def flatten_reference(
    kp: FlattenKernelParams,
    tokens_enc: jax.Array,   # (S, E) f32 — ENCODER OUTPUT tokens
    desired_vel,
    pos_x,
    quat: jax.Array,         # (1, 4) f32
    h: jax.Array,            # (3, 1, 128) f32
    c: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-jnp mirror of the kernel's decoder/LSTM math (same helpers,
    no Pallas) for testing — the flatten analog of
    model_kernel.megakernel_reference. Takes the encoder OUTPUT so the
    (separately verified) integer region stays out of the comparison."""
    f32, bf = jnp.float32, jnp.bfloat16
    seq, e = tokens_enc.shape
    groups = kp.wpack.shape[0] - 1
    tpg = _BLOCK_ROWS // e
    dec = kp.bdec
    for g in range(groups):
        wblk = kp.wpack[g]
        part = None
        for j in range(tpg):
            term = jnp.dot(
                tokens_enc[g * tpg + j][None, :].astype(bf),
                wblk[j * e : (j + 1) * e].astype(bf),
                preferred_element_type=f32,
            )
            part = term if part is None else part + term
        dec = dec + part * kp.wscale[_S_DEC][None, :]
    desired_vel = jnp.float32(desired_vel)
    extra = jnp.concatenate(
        [(desired_vel / 10.0).reshape(1, 1), quat], axis=1
    )
    cmd, hs, cs = _lstm_head_postprocess(
        dec, kp.wpack[groups], kp.wscale, kp.b0, kp.b1, kp.b2,
        kp.whead, kp.bhead, extra, h, c, desired_vel, jnp.float32(pos_x),
    )
    return cmd, jnp.stack(hs), jnp.stack(cs)


@functools.partial(
    jax.jit, static_argnames=("interpret", "softmax_mode", "num_layers",
                              "heads")
)
def flatten_fused_step(
    kp: FlattenKernelParams,
    tokens: jax.Array,       # (S, E) f32 — PRE-LN tokens (conv+resize XLA)
    desired_vel: jax.Array,
    pos_x: jax.Array,
    quat: jax.Array,         # (1, 4) f32
    h: jax.Array,            # (L, 1, 128) f32
    c: jax.Array,
    num_layers: int = 1,
    heads: int = 1,
    interpret: bool = False,
    softmax_mode: str = "onepass",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """pre-LN tokens -> (postprocessed cmd (3,), h', c'), ONE launch."""
    seq, e = tokens.shape
    groups = kp.wpack.shape[0] - 1
    vp = jnp.stack([desired_vel, pos_x]).astype(jnp.float32)[None, :]

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    enc_flat = [w for layer in kp.encs for w in layer]
    cmd, h_new, c_new = pl.pallas_call(
        functools.partial(
            _flatten_megakernel, softmax_mode, num_layers, seq, e, heads,
            groups,
        ),
        grid=(groups + 1,),
        in_specs=[
            smem((1, 2)),
            *[smem((1, N_ISCALARS)) for _ in range(num_layers)],
            *[smem((1, N_FSCAL)) for _ in range(num_layers)],
            const(tokens.shape),
            const(kp.tokg.shape), const(kp.tokb.shape),
            *[const(w.shape) for w in enc_flat],
            pl.BlockSpec(
                (1, _BLOCK_ROWS, kp.wpack.shape[2]), lambda i: (i, 0, 0),
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
            pltpu.VMEM((seq, e), jnp.float32),
            pltpu.VMEM((1, kp.wpack.shape[2]), jnp.float32),
        ],
        # In-place LSTM state update (h -> h', c -> c'), same aliasing
        # as the flagship kernel. Operand order: vp(1) + L iscal + L
        # fscal + 3 (x, tokg, tokb) + 16L enc + 8 (wpack..bhead) + 1
        # quat -> h is at 18L + 13.
        input_output_aliases={
            (18 * num_layers + 13): 1,
            (18 * num_layers + 14): 2,
        },
        interpret=interpret,
    )(
        vp,
        *kp.iscals,
        *kp.fscals,
        tokens, kp.tokg, kp.tokb,
        *enc_flat,
        kp.wpack, kp.wscale, kp.bdec,
        kp.b0, kp.b1, kp.b2,
        kp.whead, kp.bhead,
        quat, h, c,
    )
    return cmd[0], h_new, c_new
