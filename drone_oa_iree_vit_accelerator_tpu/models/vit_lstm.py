"""ITAViTLSTM — the model family, config-driven, as pure functions.

One implementation covers all four reference variants (core/config.py).
The forward pass mirrors reference
models/ITA_single_layer_upsample_shuffle/model.py:86-140 (flagship) and
models/ITA*/model.py (flatten-fusion variants):

    depth frame (B,1,60,90) ──tokenizer──> tokens (B,S,E)
      ──[attention + residual + LN, FFN + residual + LN] x L──>
      ──fusion (pixel-shuffle ⊕ bilinear-upsample -> conv, or flatten)──>
      ──spectral-norm decoder -> 512 ── cat(vel/10, quat) -> 517 ──>
      ──3-layer LSTM(128) ──> fc 128->3 = velocity command

The attention/FFN sub-blocks are *pluggable*: the float path, the QAT
fake-quant path, the jnp integer golden path, and the Pallas TPU kernel
all implement the same (layer_idx, x) -> y interface. This function
boundary is the TPU-native equivalent of the reference's IREE
transform-dialect custom-dispatch swap (ITA_spec.mlir): no pattern
matching on a compiled graph — just pass a different block function and
jit.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import FusionKind, ModelConfig
from ..utils.image import bilinear_resize, pixel_shuffle
from . import layers as L


class LSTMState(NamedTuple):
    h: jax.Array  # (num_layers, B, hidden)
    c: jax.Array  # (num_layers, B, hidden)


def zero_state(cfg: ModelConfig, batch: int) -> LSTMState:
    shape = (cfg.lstm_layers, batch, cfg.lstm_hidden)
    return LSTMState(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


# ---------------------------------------------------------------------------
# Initialization (matches torch defaults so scratch training behaves alike)
# ---------------------------------------------------------------------------


def _init_linear(key, fan_in: int, fan_out: int) -> dict:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _init_conv(key, cin: int, cout: int, k: int) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = cin * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (cout, cin, k, k), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _init_ln(dim: int) -> dict:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def init_params(cfg: ModelConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 64))
    params: dict = {
        "tokenizer": {
            "conv": _init_conv(next(keys), 1, cfg.E, cfg.patch_size),
            "ln": _init_ln(cfg.E),
        },
        "blocks": tuple(
            {
                "attn": {
                    "q": _init_linear(next(keys), cfg.E, cfg.P),
                    "k": _init_linear(next(keys), cfg.E, cfg.P),
                    "v": _init_linear(next(keys), cfg.E, cfg.P),
                    "o": _init_linear(next(keys), cfg.P, cfg.E),
                },
                "ln1": _init_ln(cfg.E),
                "ffn": {
                    "fc1": _init_linear(next(keys), cfg.E, cfg.F),
                    "fc2": _init_linear(next(keys), cfg.F, cfg.E),
                },
                "ln2": _init_ln(cfg.E),
            }
            for _ in range(cfg.num_layers)
        ),
        "decoder": {
            **_init_linear(next(keys), cfg.decoder_in, cfg.decoder_out),
            "u": jax.random.normal(next(keys), (cfg.decoder_out,)),
            "v": jax.random.normal(next(keys), (cfg.decoder_in,)),
        },
        "lstm": tuple(
            {
                "w_ih": _init_linear(
                    next(keys),
                    cfg.lstm_in if li == 0 else cfg.lstm_hidden,
                    4 * cfg.lstm_hidden,
                )["w"],
                "w_hh": _init_linear(next(keys), cfg.lstm_hidden, 4 * cfg.lstm_hidden)["w"],
                "b_ih": jnp.zeros((4 * cfg.lstm_hidden,), jnp.float32),
                "b_hh": jnp.zeros((4 * cfg.lstm_hidden,), jnp.float32),
            }
            for li in range(cfg.lstm_layers)
        ),
        "fc2": {
            **_init_linear(next(keys), cfg.lstm_hidden, cfg.out_dim),
            "u": jax.random.normal(next(keys), (cfg.out_dim,)),
            "v": jax.random.normal(next(keys), (cfg.lstm_hidden,)),
        },
    }
    if cfg.fusion is FusionKind.PXSHUFFLE_UPSAMPLE:
        cin = cfg.E // 4 + cfg.E  # pixel-shuffle branch + upsample branch
        params["fusion"] = {"conv": _init_conv(next(keys), cin, cfg.fusion_out_channels, 3)}
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

BlockFn = Callable[[int, jax.Array], jax.Array]  # (layer_idx, (B,S,E)) -> (B,S,E)


def refine_inputs(
    cfg: ModelConfig,
    frame: jax.Array,
    quat: jax.Array | None,
) -> tuple[jax.Array, jax.Array]:
    """Shape/format fixup mirroring reference model.py:18-33: synthesize a
    unit quaternion when missing, bilinear-resize the frame to 60x90."""
    if quat is None:
        quat = jnp.zeros((frame.shape[0], 4), jnp.float32).at[:, 0].set(1.0)
    if frame.shape[-2:] != cfg.img_hw:
        frame = bilinear_resize(frame, cfg.img_hw, align_corners=False)
    return frame, quat


def encoder_tokens(
    cfg: ModelConfig,
    params: dict,
    frame: jax.Array,
    attn_fn: BlockFn,
    ffn_fn: BlockFn,
) -> jax.Array:
    """frame (B,1,60,90) -> encoded tokens (B,S,E); post-norm residuals."""
    x = L.tokenizer_forward(frame, params["tokenizer"], cfg)
    for i in range(cfg.num_layers):
        blk = params["blocks"][i]
        x = L.layer_norm(x + attn_fn(i, x), blk["ln1"])
        x = L.layer_norm(x + ffn_fn(i, x), blk["ln2"])
    return x


def fuse_tokens(cfg: ModelConfig, params: dict, x: jax.Array) -> jax.Array:
    """Token fusion -> flat decoder input (B, decoder_in)."""
    b = x.shape[0]
    if cfg.fusion is FusionKind.FLATTEN:
        return x.reshape(b, cfg.S * cfg.E)
    th, tw = cfg.token_hw
    x2d = x.transpose(0, 2, 1).reshape(b, cfg.E, th, tw)  # (B,E,8,16)
    shuffled = pixel_shuffle(x2d, 2)  # (B,E/4,16,32)
    upsampled = bilinear_resize(x2d, cfg.fusion_hw, align_corners=True)
    fused = jnp.concatenate([shuffled, upsampled], axis=1)  # (B,E/4+E,16,32)
    down = L.conv2d(fused, params["fusion"]["conv"], stride=1, padding=1)
    return down.reshape(b, -1)  # (B, 9*16*32=4608)


def fuse_tokens_nhwc(cfg: ModelConfig, params: dict, x: jax.Array) -> jax.Array:
    """Feature-last token fusion: tokens (B, S, E) -> (B, decoder_in).

    Values identical to fuse_tokens up to f32 reduction order: the
    pixel-shuffle/upsample/conv chain runs NHWC (features in lanes) and
    the tiny (B, 16, 32, 9) conv output is transposed back to the NCHW
    flatten order the decoder expects — drop-in for every caller.
    """
    b = x.shape[0]
    if cfg.fusion is FusionKind.FLATTEN:
        return x.reshape(b, cfg.S * cfg.E)  # token-major, same as fuse_tokens
    th, tw = cfg.token_hw
    y = x.reshape(b, th, tw, cfg.E)  # (B, 8, 16, E) NHWC
    shuffled = L.pixel_shuffle_nhwc(y, 2)  # (B, 16, 32, E/4)
    fh, fw = cfg.fusion_hw
    from ..utils.image import _interp_matrix

    mh = jnp.asarray(_interp_matrix(th, fh, True), y.dtype)
    mw = jnp.asarray(_interp_matrix(tw, fw, True), y.dtype)
    up = jnp.einsum("bhwc,Ww->bhWc", y, mw)
    up = jnp.einsum("bhWc,Hh->bHWc", up, mh)  # (B, 16, 32, E)
    fused = jnp.concatenate([shuffled, up], axis=-1)  # (B,16,32,E/4+E)
    down = L.conv2d_nhwc(fused, params["fusion"]["conv"], stride=1, padding=1)
    return down.transpose(0, 3, 1, 2).reshape(b, -1)  # NCHW flatten order


def forward(
    cfg: ModelConfig,
    params: dict,
    frame: jax.Array,
    vel: jax.Array,
    quat: jax.Array | None,
    state: LSTMState | None = None,
    *,
    attn_fn: BlockFn | None = None,
    ffn_fn: BlockFn | None = None,
    encoder_fn: Callable[[dict, jax.Array], jax.Array] | None = None,
    encoder_layout: str = "bse",
    training: bool = False,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, LSTMState]:
    """Full model step: (frame, vel, quat, state) -> (cmd (B,3), state').

    ``attn_fn``/``ffn_fn`` default to the float path; pass alternatives to
    swap the quantized region implementation (see module docstring).
    ``encoder_fn(params, tokens) -> tokens`` replaces the whole
    attention/FFN/LN block loop instead (used by the fused Pallas path,
    which keeps residual+LN inside the kernel).
    ``encoder_layout="nhwc"``: run the tokenizer and token fusion in
    feature-last (NHWC) form — tokens are still (B, S, E) with identical
    ordering, but the conv/resize/pixel-shuffle chain keeps features in
    lanes, eliminating the layout copies + conv-layout poisoning measured
    around the Pallas kernel. Drop-in numerically (f32 reduction order
    only).
    """
    if attn_fn is None:
        attn_fn = lambda i, x: L.attention_f32(x, params["blocks"][i]["attn"], cfg.H)
    if ffn_fn is None:
        ffn_fn = lambda i, x: L.ffn_f32(x, params["blocks"][i]["ffn"])

    frame, quat = refine_inputs(cfg, frame, quat)
    if state is None:
        state = zero_state(cfg, frame.shape[0])

    if encoder_layout == "nhwc":
        tokens = L.tokenizer_forward_nhwc(frame, params["tokenizer"], cfg)
        if encoder_fn is not None:
            x = encoder_fn(params, tokens)
        else:
            x = tokens
            for i in range(cfg.num_layers):
                blk = params["blocks"][i]
                x = L.layer_norm(x + attn_fn(i, x), blk["ln1"])
                x = L.layer_norm(x + ffn_fn(i, x), blk["ln2"])
        flat = fuse_tokens_nhwc(cfg, params, x)
    elif encoder_fn is not None:
        x = encoder_fn(params, L.tokenizer_forward(frame, params["tokenizer"], cfg))
        flat = fuse_tokens(cfg, params, x)
    else:
        x = encoder_tokens(cfg, params, frame, attn_fn, ffn_fn)
        flat = fuse_tokens(cfg, params, x)

    dec = params["decoder"]
    if cfg.spectral_norm_decoder and "u" in dec:
        w_sn, _, _ = L.spectral_norm_weight(dec["w"], dec["u"], dec["v"], update=False)
        out = flat @ w_sn + dec["b"]
    else:
        out = L.linear(flat, dec)

    feat = jnp.concatenate([out, vel / 10.0, quat], axis=1)  # (B, 517)
    lstm_rng = rng if (training and rng is not None) else None
    y, (h, c) = L.lstm_forward(
        feat, state, params["lstm"], cfg.lstm_dropout, lstm_rng
    )

    head = params["fc2"]
    if cfg.spectral_norm_decoder and "u" in head:
        w_sn, _, _ = L.spectral_norm_weight(head["w"], head["u"], head["v"], update=False)
        cmd = y @ w_sn + head["b"]
    else:
        cmd = L.linear(y, head)
    return cmd, LSTMState(h, c)


def make_tail_matrix(
    cfg: ModelConfig, params: dict
) -> tuple[jax.Array, jax.Array]:
    """Precompose fusion + decoder into ONE (S*E, decoder_out) matrix.

    Everything between the encoder output and the LSTM input is linear in
    the tokens: pixel-shuffle (a permutation), bilinear upsample (a fixed
    interpolation matrix), the 3x3 fusion conv, the flatten, and the
    decoder matmul (reference flagship model.py:107-129). Composed
    offline, the whole chain becomes ``dec = y.reshape(B, S*E) @ W_tail
    + b_tail`` — one dense K=S*E GEMM with perfect MXU shapes, replacing
    the 9-output-channel conv (7% MXU lane fill, 366 us measured at
    batch 1024) and its surrounding layout copies (~670 us total ->
    ~50 us).

    Exact: the map is linear, so its Jacobian (via jax.jacrev — 512
    backward passes, cheap) IS the matrix; no approximation beyond f32
    summation-order differences. Spectral norm is baked first
    (freeze_for_inference semantics). This is an inference-time weight
    transformation in the same spirit as the reference's deployment
    export folding (weights materialized at export, export/model.py).
    """
    params = freeze_for_inference(cfg, params)
    d_in = cfg.S * cfg.E
    dec = params["decoder"]

    def tail(yflat: jax.Array) -> jax.Array:
        x = yflat.reshape(1, cfg.S, cfg.E)
        flat = fuse_tokens(cfg, params, x)
        return (flat @ dec["w"] + dec["b"])[0]

    b_tail = tail(jnp.zeros((d_in,), jnp.float32))
    w_tail = jax.jacrev(tail)(jnp.zeros((d_in,), jnp.float32)).T
    return w_tail, b_tail  # (S*E, decoder_out), (decoder_out,)


def freeze_for_inference(cfg: ModelConfig, params: dict) -> dict:
    """Precompute inference-constant transforms: bake the spectral
    normalization of the decoder/head weights into the stored weight and
    drop the (u, v) power-iteration vectors.

    At inference the spectral norm is a fixed linear rescale (the
    reference exports the already-normalized weight into ONNX the same
    way — torch's spectral_norm is a weight reparametrization that
    materializes at eval). Recomputing the u^T W v reduction per frame
    cost ~6 us/call on the serving path; the frozen pytree is numerically
    IDENTICAL (same reduction, computed once). forward() detects frozen
    params by the absent 'u' key. Training must keep the unfrozen form.
    """
    if not cfg.spectral_norm_decoder:
        return params
    p = dict(params)
    for k in ("decoder", "fc2"):
        d = dict(p[k])
        if "u" not in d:
            continue
        w_sn, _, _ = L.spectral_norm_weight(d["w"], d["u"], d["v"], update=False)
        d["w"] = w_sn
        del d["u"], d["v"]
        p[k] = d
    return p
