"""The vitfly-style LSTMNetVIT family ("ITALSTM") — the upstream model.

The reference's alt export path targets the upstream vitfly architecture
(reference scripts/export_model.py:40-240 and models/converter_to_pt.py):
a two-stage Mix-Transformer encoder (SegFormer-style) instead of the
single-stage ITA tokenizer:

    stage 1: OverlapPatchMerge 1->32  (k7 s4 p3) -> 2 x [EfficientSelfAttention(rr=8, h=1) + MixFFN(x8) + LN]
    stage 2: OverlapPatchMerge 32->64 (k3 s2 p1) -> 2 x [EfficientSelfAttention(rr=4, h=2) + MixFFN(x8) + LN]
    decode : cat[PixelShuffle(stage2), bilinear-up(stage1 -> 16x24)]
             -> conv 48->12 -> flatten 4608 -> spectral decoder 512
    head   : cat[dec, vel/10, quat] = 517 -> LSTM(128 x3) -> fc 3

Differences from the ITA family worth noting: EfficientSelfAttention
DOES scale logits by 1/sqrt(d) and computes K/V from a spatially
reduced (strided-conv + LN) copy of the tokens; MixFFN has a depthwise
3x3 conv and GELU. The LSTM consumes the whole trajectory as its
sequence axis (upstream semantics) — per-frame serving is T=1.

Parameter naming for torch import follows export_model.py's module names
(cn1/layerNorm/keyValueExtractor/query/finalLayer/mlp1/depthwise/mlp2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.image import bilinear_resize, pixel_shuffle
from . import layers as L
from .vit_lstm import LSTMState


class StageConfig(NamedTuple):
    in_ch: int
    out_ch: int
    patch: int
    stride: int
    pad: int
    n_layers: int
    reduction: int
    heads: int
    expansion: int


class VitflyConfig(NamedTuple):
    name: str = "vitfly_lstm"
    stages: tuple[StageConfig, ...] = (
        StageConfig(1, 32, 7, 4, 3, 2, 8, 1, 8),
        StageConfig(32, 64, 3, 2, 1, 2, 4, 2, 8),
    )
    img_hw: tuple[int, int] = (60, 90)
    fusion_hw: tuple[int, int] = (16, 24)
    fusion_out_channels: int = 12
    decoder_in: int = 4608  # 12 * 16 * 24
    decoder_out: int = 512
    lstm_hidden: int = 128
    lstm_layers: int = 3
    lstm_dropout: float = 0.1
    out_dim: int = 3


VITFLY_LSTM = VitflyConfig()


def _init_linear(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _init_conv(key, cin, cout, k, groups=1):
    kw, kb = jax.random.split(key)
    fan_in = cin // groups * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            kw, (cout, cin // groups, k, k), jnp.float32, -bound, bound
        ),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _init_ln(dim):
    return {"g": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def init_params(cfg: VitflyConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 128))
    stages = []
    for sc in cfg.stages:
        layers = []
        for _ in range(sc.n_layers):
            layers.append(
                {
                    "attn": {
                        "reduce_conv": _init_conv(
                            next(keys), sc.out_ch, sc.out_ch, sc.reduction
                        ),
                        "reduce_ln": _init_ln(sc.out_ch),
                        "kv": _init_linear(next(keys), sc.out_ch, 2 * sc.out_ch),
                        "q": _init_linear(next(keys), sc.out_ch, sc.out_ch),
                        "out": _init_linear(next(keys), sc.out_ch, sc.out_ch),
                    },
                    "ffn": {
                        "mlp1": _init_linear(
                            next(keys), sc.out_ch, sc.out_ch * sc.expansion
                        ),
                        "dw": _init_conv(
                            next(keys),
                            sc.out_ch * sc.expansion,
                            sc.out_ch * sc.expansion,
                            3,
                            groups=sc.out_ch * sc.expansion,
                        ),
                        "mlp2": _init_linear(
                            next(keys), sc.out_ch * sc.expansion, sc.out_ch
                        ),
                    },
                    "ln": _init_ln(sc.out_ch),
                }
            )
        stages.append(
            {
                "patch_conv": _init_conv(next(keys), sc.in_ch, sc.out_ch, sc.patch),
                "patch_ln": _init_ln(sc.out_ch),
                "layers": tuple(layers),
            }
        )
    return {
        "stages": tuple(stages),
        "fusion_conv": _init_conv(
            next(keys),
            cfg.stages[1].out_ch // 4 + cfg.stages[0].out_ch,
            cfg.fusion_out_channels,
            3,
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
                    cfg.decoder_out + 5 if i == 0 else cfg.lstm_hidden,
                    4 * cfg.lstm_hidden,
                )["w"],
                "w_hh": _init_linear(next(keys), cfg.lstm_hidden, 4 * cfg.lstm_hidden)["w"],
                "b_ih": jnp.zeros((4 * cfg.lstm_hidden,)),
                "b_hh": jnp.zeros((4 * cfg.lstm_hidden,)),
            }
            for i in range(cfg.lstm_layers)
        ),
        "fc2": {
            **_init_linear(next(keys), cfg.lstm_hidden, cfg.out_dim),
            "u": jax.random.normal(next(keys), (cfg.out_dim,)),
            "v": jax.random.normal(next(keys), (cfg.lstm_hidden,)),
        },
    }


def reduce_tokens(x: jax.Array, p: dict, hw, reduction: int) -> jax.Array:
    """The K/V spatial reduction: strided conv + LayerNorm on the token
    map (reference export_model.py:66-71). FLOAT region even in the
    quantized model — the reference's ITASelfAttentionWrapper computes
    cn1/ln1 outside the quantized module (export_model.py:171-178)."""
    b, n, c = x.shape
    h, w = hw
    x1 = x.transpose(0, 2, 1).reshape(b, c, h, w)
    x1 = L.conv2d(x1, p["reduce_conv"], stride=reduction, padding=0)
    x1 = x1.reshape(b, c, -1).transpose(0, 2, 1)
    return L.layer_norm(x1, p["reduce_ln"])


def efficient_attention(x: jax.Array, p: dict, hw, heads: int, reduction: int):
    """EfficientSelfAttention (reference export_model.py:53-80): K/V from
    a strided-conv-reduced token map; WITH 1/sqrt(d) scaling."""
    b, n, c = x.shape
    x1 = reduce_tokens(x, p, hw, reduction)

    kv = L.linear(x1, p["kv"])  # (B, M, 2C)
    m = kv.shape[1]
    kv = kv.reshape(b, m, 2, heads, c // heads).transpose(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]  # (B, heads, M, d)
    q = L.linear(x, p["q"]).reshape(b, n, heads, c // heads).transpose(0, 2, 1, 3)

    scale = (c / heads) ** 0.5
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) / scale, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return L.linear(out, p["out"])


def mix_ffn(x: jax.Array, p: dict, hw):
    """MixFFN (reference export_model.py:82-97): expand -> depthwise 3x3
    -> GELU -> project."""
    b, n, c = x.shape
    h, w = hw
    y = L.linear(x, p["mlp1"])  # (B, N, C*e)
    ce = y.shape[-1]
    y2d = y.transpose(0, 2, 1).reshape(b, ce, h, w)
    y2d = jax.lax.conv_general_dilated(
        y2d,
        p["dw"]["w"],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=ce,
    ) + p["dw"]["b"][None, :, None, None]
    y = jax.nn.gelu(y2d.reshape(b, ce, n).transpose(0, 2, 1), approximate=False)
    return L.linear(y, p["mlp2"])


def _stage_forward(
    x2d: jax.Array, sp: dict, sc: StageConfig, stage_idx: int = 0,
    attn_fn=None,
):
    """(B, Cin, H, W) -> (B, Cout, H', W').

    ``attn_fn(stage_idx, layer_idx, tokens, reduced) -> attn_out``
    swaps the attention for another implementation at the SAME boundary
    the reference's quantized export uses (MiXITAEncoderLayer replaces
    EfficientSelfAttention with the ITA wrapper while the reduction
    conv/LN stays float, export_model.py:183-203); None = float path.
    """
    y = L.conv2d(x2d, sp["patch_conv"], stride=sc.stride, padding=sc.pad)
    b, c, h, w = y.shape
    tokens = L.layer_norm(y.reshape(b, c, h * w).transpose(0, 2, 1), sp["patch_ln"])
    for li, lp in enumerate(sp["layers"]):
        if attn_fn is None:
            attn = efficient_attention(
                tokens, lp["attn"], (h, w), sc.heads, sc.reduction
            )
        else:
            reduced = reduce_tokens(tokens, lp["attn"], (h, w), sc.reduction)
            attn = attn_fn(stage_idx, li, tokens, reduced)
        tokens = tokens + attn
        tokens = tokens + mix_ffn(tokens, lp["ffn"], (h, w))
        tokens = L.layer_norm(tokens, lp["ln"])
    return tokens.transpose(0, 2, 1).reshape(b, c, h, w)


def forward(
    cfg: VitflyConfig,
    params: dict,
    frame: jax.Array,  # (B, 1, 60, 90)
    vel: jax.Array,    # (B, 1)
    quat: jax.Array,   # (B, 4)
    state: LSTMState | None = None,
    training: bool = False,
    rng: jax.Array | None = None,
    attn_fn=None,
) -> tuple[jax.Array, LSTMState]:
    """Per-frame step (T=1 upstream semantics): (B,...) -> cmd (B,3).

    ``attn_fn``: optional attention swap hook (see _stage_forward) —
    the quantized paths (quant/vitfly_qat.py) plug in here."""
    if frame.shape[-2:] != cfg.img_hw:
        frame = bilinear_resize(frame, cfg.img_hw, align_corners=False)
    b = frame.shape[0]
    if state is None:
        state = LSTMState(
            jnp.zeros((cfg.lstm_layers, b, cfg.lstm_hidden)),
            jnp.zeros((cfg.lstm_layers, b, cfg.lstm_hidden)),
        )

    f1 = _stage_forward(
        frame, params["stages"][0], cfg.stages[0], 0, attn_fn
    )  # (B,32,15,23)
    f2 = _stage_forward(
        f1, params["stages"][1], cfg.stages[1], 1, attn_fn
    )   # (B,64,8,12)

    fused = jnp.concatenate(
        [
            pixel_shuffle(f2, 2),                                   # (B,16,16,24)
            bilinear_resize(f1, cfg.fusion_hw, align_corners=True),  # (B,32,16,24)
        ],
        axis=1,
    )
    flat = L.conv2d(fused, params["fusion_conv"], stride=1, padding=1).reshape(b, -1)

    dec = params["decoder"]
    w_sn, _, _ = L.spectral_norm_weight(dec["w"], dec["u"], dec["v"])
    out = flat @ w_sn + dec["b"]

    feat = jnp.concatenate([out, vel / 10.0, quat], axis=1)
    y, (h, c) = L.lstm_forward(
        feat, state, params["lstm"], cfg.lstm_dropout,
        rng if (training and rng is not None) else None,
    )
    head = params["fc2"]
    w2, _, _ = L.spectral_norm_weight(head["w"], head["u"], head["v"])
    return y @ w2 + head["b"], LSTMState(h, c)
