"""Functional model layers (pure functions over parameter pytrees).

Naming/shape conventions:

- Linear weights are stored (in_features, out_features) — transposed from
  torch's (out, in) — so every projection is ``x @ w`` on the MXU; the
  checkpoint converter (models/params_io.py) transposes on load.
- Convs are NCHW/OIHW to match the reference exactly.
- LSTM gate order is torch's (i, f, g, o) so converted checkpoints are
  drop-in (reference models/*/model.py use nn.LSTM).

Reference counterparts cited per function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.image import bilinear_resize


def linear(x: jax.Array, p: dict) -> jax.Array:
    y = x @ p["w"]
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def conv2d(
    x: jax.Array, p: dict, stride: int = 1, padding: int = 0
) -> jax.Array:
    """NCHW conv matching torch nn.Conv2d(stride, padding)."""
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if p.get("b") is not None:
        y = y + p["b"][None, :, None, None]
    return y


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing axis (torch nn.LayerNorm(E))."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def spectral_norm_weight(
    w: jax.Array,
    u: jax.Array,
    v: jax.Array,
    update: bool = False,
    eps: float = 1e-12,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Spectral normalization of a (in, out) weight.

    torch spectral_norm semantics (reference flagship model.py:81,84 wraps
    decoder and fc2): one power iteration per *training* forward updates
    the singular-vector estimates ``u`` (out,) / ``v`` (in,) (torch views
    the weight as (out, in)); w is divided by the estimated top singular
    value. In eval mode torch reuses the stored u AND v without iteration,
    so both are threaded here. Returns (w / sigma, u, v).
    """

    def _norm(x):
        return x / (jnp.linalg.norm(x) + eps)

    wt = w.T  # torch weight_mat view: (out, in)
    if update:
        v = _norm(wt.T @ u)  # (in,)
        u = _norm(wt @ v)  # (out,)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = u @ (wt @ v)
    return w / sigma, u, v


def tokenizer_forward(x: jax.Array, p: dict, cfg) -> jax.Array:
    """OverlapPatchMerging: conv k7 s2 p3 -> bilinear to token grid ->
    flatten -> LayerNorm (reference models/ITA/layers.py:7-27).

    x: (B, 1, H, W) -> tokens (B, S, E).
    """
    y = conv2d(x, p["conv"], stride=cfg.patch_stride, padding=cfg.patch_padding)
    y = bilinear_resize(y, cfg.token_hw, align_corners=False)
    b, c, h, w = y.shape
    tokens = y.reshape(b, c, h * w).transpose(0, 2, 1)  # (B, S, E)
    return layer_norm(tokens, p["ln"])


def attention_f32(x: jax.Array, p: dict, num_heads: int) -> jax.Array:
    """Float ITA-style self-attention — NO 1/sqrt(d) logit scaling
    (reference models/ITA/layers.py:67-88 feeds QK^T directly to softmax).

    x: (B, S, E) -> (B, S, E).
    """
    b, s, _ = x.shape
    q = linear(x, p["q"])  # (B, S, P)
    k = linear(x, p["k"])
    v = linear(x, p["v"])
    proj = q.shape[-1]
    d = proj // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhsd,bhtd->bhst", qh, kh)  # no scaling!
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhst,bhtd->bhsd", attn, vh)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, proj)
    return linear(ctx, p["o"])


def ffn_f32(x: jax.Array, p: dict) -> jax.Array:
    """Float FFN: Linear E->F, ReLU, Linear F->E
    (reference models/ITA/layers.py:29-45)."""
    return linear(jax.nn.relu(linear(x, p["fc1"])), p["fc2"])


def lstm_cell(
    x: jax.Array, h: jax.Array, c: jax.Array, p: dict
) -> tuple[jax.Array, jax.Array]:
    """One torch-ordered LSTM cell step: gates (i, f, g, o).

    x: (B, in), h/c: (B, hidden). Weights stored transposed:
    w_ih (in, 4*hidden), w_hh (hidden, 4*hidden).
    """
    gates = x @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_forward(
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
    layers: tuple[dict, ...],
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Multi-layer LSTM single-timestep forward (torch nn.LSTM semantics;
    the reference always feeds sequence length 1, model.py:131-135).

    x: (B, in); state: (h, c) each (num_layers, B, hidden). Dropout is
    applied between layers only (not after the last), only when an rng is
    passed — matching torch nn.LSTM(dropout=0.1) in training mode.
    """
    h_all, c_all = state
    hs, cs = [], []
    out = x
    n = len(layers)
    for li, p in enumerate(layers):
        h_new, c_new = lstm_cell(out, h_all[li], c_all[li], p)
        hs.append(h_new)
        cs.append(c_new)
        out = h_new
        if rng is not None and dropout_rate > 0.0 and li < n - 1:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - dropout_rate, out.shape)
            out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0)
    return out, (jnp.stack(hs), jnp.stack(cs))
