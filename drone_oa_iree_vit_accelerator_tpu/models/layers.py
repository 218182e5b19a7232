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


def conv2d_im2col_tokens(
    x: jax.Array, p: dict, stride: int, padding: int
) -> tuple[jax.Array, int, int]:
    """Conv2d as one im2col GEMM, emitting channel-LAST (B, OH*OW, Cout).

    TPU-native formulation of the tokenizer conv: XLA's convolution
    emitter, when its consumer is a custom call demanding a standard
    layout (the Pallas encoder kernel), falls back to a degenerate
    T(2,128) layout that ran 15x slower than the same conv in the pure-f32
    graph. A stack of k*k strided slices + a single (OH*OW, Cin*k*k) x
    (Cin*k*k, Cout) matmul rides the MXU, needs no layout negotiation, and
    lands directly in the token-major layout every downstream op wants.
    Numerically identical to conv2d up to f32 summation order.
    """
    b, cin, h, w = x.shape
    cout, _, kh, kw = p["w"].shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    oh = (h + 2 * padding - kh) // stride + 1
    ow = (w + 2 * padding - kw) // stride + 1
    if cin == 1:
        # Depth-camera case: no channel axis to interleave, so the patch
        # tensor is built channel-last directly (no 5-D transpose).
        cols = [
            xp[:, 0, ky : ky + stride * oh : stride, kx : kx + stride * ow : stride]
            for ky in range(kh)
            for kx in range(kw)
        ]
        patches = jnp.stack(cols, axis=-1).reshape(b, oh * ow, kh * kw)
        wmat = p["w"].reshape(cout, kh * kw).T  # (k*k, Cout)
    else:
        cols = [
            xp[:, :, ky : ky + stride * oh : stride, kx : kx + stride * ow : stride]
            for ky in range(kh)
            for kx in range(kw)
        ]
        patches = jnp.stack(cols, axis=-1)  # (B, Cin, OH, OW, k*k)
        patches = patches.transpose(0, 2, 3, 1, 4).reshape(
            b, oh * ow, cin * kh * kw
        )
        wmat = p["w"].transpose(1, 2, 3, 0).reshape(cin * kh * kw, cout)
    y = patches @ wmat
    if p.get("b") is not None:
        y = y + p["b"]
    return y, oh, ow


def tokenizer_forward(x: jax.Array, p: dict, cfg) -> jax.Array:
    """OverlapPatchMerging: conv k7 s2 p3 -> bilinear to token grid ->
    flatten -> LayerNorm (reference models/ITA/layers.py:7-27).

    x: (B, 1, H, W) -> tokens (B, S, E). Uses XLA's convolution emitter —
    an im2col-GEMM rewrite was tried and measured 80x SLOWER (strided
    lane-dim slicing is pathological on TPU; see conv2d_im2col_tokens,
    kept for reference/tests).
    """
    y = conv2d(x, p["conv"], stride=cfg.patch_stride, padding=cfg.patch_padding)
    b, c, oh, ow = y.shape
    th, tw = cfg.token_hw
    if b >= 64 and (oh, ow) != (th, tw):
        # Large batch: one kron-matrix contraction instead of the
        # two-stage resize — the conv output is the batched step's
        # dominant HBM stream and this reads it once (same rationale as
        # tokenizer_preln_nhwc; values equal up to summation order). The
        # GEMM emits (B, S, E) directly, absorbing the transpose.
        mh = jnp.asarray(_interp_matrix_cached(oh, th), y.dtype)
        mw = jnp.asarray(_interp_matrix_cached(ow, tw), y.dtype)
        rmat = jnp.einsum("Hh,Ww->HWhw", mh, mw).reshape(th * tw, oh * ow)
        tokens = jnp.einsum("tp,bcp->btc", rmat, y.reshape(b, c, oh * ow))
        return layer_norm(tokens, p["ln"])
    y = bilinear_resize(y, cfg.token_hw, align_corners=False)
    tokens = y.reshape(b, c, th * tw).transpose(0, 2, 1)  # (B, S, E)
    return layer_norm(tokens, p["ln"])


def conv2d_nhwc(
    x_nhwc: jax.Array, p: dict, stride: int = 1, padding: int = 0
) -> jax.Array:
    """NHWC conv (weights stored OIHW, transposed to HWIO at trace time).

    Feature-last is the TPU-native conv form: the channel axis rides the
    128 lanes. XLA reaches the same form for free-standing convs, but a
    Pallas custom call downstream pins layouts and strands the NCHW form
    in a T(1,128) layout 15x slower (measured); writing NHWC explicitly
    makes the fast form unconditional.
    """
    y = jax.lax.conv_general_dilated(
        x_nhwc,
        p["w"].transpose(2, 3, 1, 0),  # OIHW -> HWIO
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if p.get("b") is not None:
        y = y + p["b"]
    return y


def tokenizer_forward_nhwc(x: jax.Array, p: dict, cfg) -> jax.Array:
    """Feature-last tokenizer: (B, 1, H, W) -> tokens (B, S, E).

    Same values as tokenizer_forward (token order identical — tokens are
    spatial-major either way); the conv/resize run NHWC so the feature
    axis stays in lanes and the result IS the (B, S, E) layout the
    encoder consumes — no transposes, no layout negotiation around the
    Pallas kernel. Float reduction order may differ (atol ~1e-6).
    """
    return layer_norm(tokenizer_preln_nhwc(x, p, cfg), p["ln"])


def tokenizer_preln_nhwc(x: jax.Array, p: dict, cfg) -> jax.Array:
    """tokenizer_forward_nhwc minus the final LayerNorm: (B,1,H,W) ->
    pre-LN tokens (B, S, E). The megakernel serving path runs the LN (and
    everything after it) inside the kernel; this is the XLA prefix.

    At large batch the two-stage resize is replaced by ONE kron-matrix
    contraction: the conv output (B, 30, 45, E) is the dominant HBM
    stream of the batched step (169 MB bf16 at B=1024), and the two-stage
    einsum reads it plus a (B, 30, 16, E) intermediate; the single
    (S, oh*ow) matmul reads it once (device-trace measured: 893 -> 728 us
    at B=1024). Values equal up to f32/bf16 summation order.
    """
    xn = x.transpose(0, 2, 3, 1)  # (B, H, W, 1)
    y = conv2d_nhwc(xn, p["conv"], stride=cfg.patch_stride, padding=cfg.patch_padding)
    th, tw = cfg.token_hw
    b, oh, ow, c = y.shape
    if (oh, ow) == (th, tw):
        return y.reshape(b, th * tw, c)
    mw = jnp.asarray(_interp_matrix_cached(ow, tw), y.dtype)
    mh = jnp.asarray(_interp_matrix_cached(oh, th), y.dtype)
    if b >= 64:
        rmat = jnp.einsum("Hh,Ww->HWhw", mh, mw).reshape(th * tw, oh * ow)
        return jnp.einsum(
            "tp,bpc->btc", rmat, y.reshape(b, oh * ow, c)
        )  # (B, S, E)
    y = jnp.einsum("bhwc,Ww->bhWc", y, mw)
    y = jnp.einsum("bhWc,Hh->bHWc", y, mh)
    return y.reshape(b, th * tw, c)  # (B, S, E), spatial-major


def _interp_matrix_cached(in_size: int, out_size: int):
    from ..utils.image import _interp_matrix

    return _interp_matrix(in_size, out_size, False)


def _token_operator(cfg) -> tuple:
    """Factored conv+resize operator matrices (cached per config dims).

    The tokenizer (reference models/ITA/layers.py:21-27: conv k7 s2 p3
    then bilinear resize to the token grid) is LINEAR in the image, and
    both stages are spatially separable, so the whole map factors into
    per-tap row/column matrices:

        tokens2d[i,j,e] = sum_{dy,dx} (Ah_dy @ X @ Aw_dx^T)[i,j] w[dy,dx,e]

    with Ah_dy = Rh @ Sh_dy (resize-rows times the stride-2 tap-dy pixel
    selection) and Aw_dx = Rw @ Sw_dx. This removes BOTH heavy XLA ops of
    the batched path — the 1-input-channel conv (25 TFLOP/s measured, XLA
    has no good form for C_in=1) and the dense kron resize (22 MFLOP/
    frame) — replacing them with three dense GEMMs totalling ~2.5 MFLOP/
    frame (12x fewer FLOPs, measured 571 -> ~60 us at batch 1024).

    Returns (Ah (k, th, H), Aw (k, tw, W)) as numpy arrays.
    """
    import numpy as np

    from ..utils.image import _interp_matrix

    h, w = cfg.img_hw
    k, stride, pad = cfg.patch_size, cfg.patch_stride, cfg.patch_padding
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    th, tw = cfg.token_hw
    rh = _interp_matrix(oh, th, False)  # (th, oh)
    rw = _interp_matrix(ow, tw, False)  # (tw, ow)
    ah = np.zeros((k, th, h), np.float32)
    aw = np.zeros((k, tw, w), np.float32)
    for d in range(k):
        for o in range(oh):
            src = stride * o + d - pad
            if 0 <= src < h:
                ah[d, :, src] += rh[:, o]
        for o in range(ow):
            src = stride * o + d - pad
            if 0 <= src < w:
                aw[d, :, src] += rw[:, o]
    return ah, aw


_TOKEN_OP_CACHE: dict = {}


def tokenizer_tokens_factored(
    x: jax.Array, p: dict, cfg, dtype=None
) -> jax.Array:
    """Pre-LN tokens via the factored conv+resize operator (see
    _token_operator): x (B, 1, H, W) -> (B, S, E). Numerically equal to
    resize(conv(x)) up to f32 summation order; ``dtype=jnp.bfloat16``
    runs the GEMMs in bf16 with f32 accumulation (deployment demotion).
    """
    key = (cfg.img_hw, cfg.patch_size, cfg.patch_stride, cfg.patch_padding,
           cfg.token_hw)
    if key not in _TOKEN_OP_CACHE:
        _TOKEN_OP_CACHE[key] = _token_operator(cfg)
    ah_np, aw_np = _TOKEN_OP_CACHE[key]
    k = cfg.patch_size
    th, tw = cfg.token_hw
    h, w = cfg.img_hw
    b = x.shape[0]
    dt = dtype or x.dtype
    f32 = jnp.float32

    v = _tokenizer_taps(x, cfg, (ah_np, aw_np), dt)
    w49 = p["conv"]["w"].reshape(cfg.E, k * k).T.astype(dt)  # (k*k, E)
    tokens = jax.lax.dot_general(
        v.astype(dt), w49, (((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    return tokens + p["conv"]["b"].astype(f32)


def _tokenizer_taps(x, cfg, ops, dt):
    """Stages 1+2 of the factored conv+resize tokenizer: (B,1,H,W) ->
    per-token conv taps (B, S, k*k) via two dense GEMMs (shared by the
    row-major and transposed stage-3 variants)."""
    ah_np, aw_np = ops
    k = cfg.patch_size
    th, tw = cfg.token_hw
    h, w = cfg.img_hw
    b = x.shape[0]
    f32 = jnp.float32
    ah = jnp.asarray(ah_np.reshape(k * th, h), dt)        # (k*th, H)
    aw = jnp.asarray(aw_np.transpose(2, 0, 1).reshape(w, k * tw), dt)
    xs = x.reshape(b, h, w).astype(dt)

    # Stage 1 (contract H): (k*th, H) x (B, H, W) -> (k*th, B, W).
    u = jax.lax.dot_general(
        ah, xs, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    # Stage 2 (contract W): -> (k*th, B, k*tw).
    v = jax.lax.dot_general(
        u.astype(dt), aw, (((2,), (0,)), ((), ())), preferred_element_type=f32
    )
    # Gather taps per token for the stage-3 conv-kernel contraction.
    v = v.reshape(k, th, b, k, tw).transpose(2, 1, 4, 0, 3)
    return v.reshape(b, th * tw, k * k)


def tokenizer_tokens_factored_T(
    x: jax.Array, p: dict, cfg, dtype=None
) -> jax.Array:
    """Transposed-layout twin of tokenizer_tokens_factored: pre-LN
    tokens as (E, B*S) with channels on the major axis — the input
    layout of the fully transposed encoder kernel
    (ops/pallas/ita_kernel.ita_encoder_block_T).

    Same stage-1/2 GEMMs; stage 3 contracts the conv kernel with the
    taps on the OTHER side — dot((E, k*k), (B, S, k*k)) -> (E, B, S) —
    so the transposed layout is the GEMM's native output, not a copy.
    Numerically equal to tokenizer_tokens_factored up to f32 dot
    accumulation order."""
    key = (cfg.img_hw, cfg.patch_size, cfg.patch_stride, cfg.patch_padding,
           cfg.token_hw)
    if key not in _TOKEN_OP_CACHE:
        _TOKEN_OP_CACHE[key] = _token_operator(cfg)
    k = cfg.patch_size
    b = x.shape[0]
    dt = dtype or x.dtype
    f32 = jnp.float32
    v = _tokenizer_taps(x, cfg, _TOKEN_OP_CACHE[key], dt)
    we = p["conv"]["w"].reshape(cfg.E, k * k).astype(dt)     # (E, k*k)
    tokens_t = jax.lax.dot_general(
        we, v.astype(dt), (((1,), (2,)), ((), ())),
        preferred_element_type=f32,
    )  # (E, B, S)
    tokens_t = tokens_t + p["conv"]["b"].astype(f32)[:, None, None]
    return tokens_t.reshape(cfg.E, b * cfg.S)


_TOKEN_OP2_CACHE: dict = {}


def tokenizer_tokens_factored2(
    x: jax.Array, p: dict, cfg, dtype=None
) -> jax.Array:
    """B-major two-GEMM form of the factored conv+resize tokenizer.

    Same linear operator as tokenizer_tokens_factored (equal up to f32
    summation order), restructured so the batch axis stays MAJOR through
    both GEMMs and the second GEMM's output is (B, th, tw, E) — a free
    reshape to the (B, S, E) the encoder kernel consumes:

        U[b, W, (th,dy)]    = sum_H  X[b,H,W] * Ah[dy,th,H]
        tokens[b,th,tw,e]   = sum_{W,dy} U * N[W,dy,tw,e],
        N[W,dy,tw,e]        = sum_dx Aw[dx,tw,W] * w_conv[e,dy,dx]

    MEASURED SLOWER than the 3-GEMM form on the turbo path at b1024
    (1.100 vs 0.964 ms/step, device traces) and therefore NOT the
    default: the hypothesis was that keeping batch major would avoid the
    3-GEMM form's two ~42 us boundary layout copies (docs/
    op_breakdown_bench.json copy.20/copy.25), but the second GEMM's 4x
    FLOPs (10.6 vs 2.5 GFLOP at b1024) plus XLA's relayout for the
    non-adjacent (W, dy) contraction cost more than the copies saved.
    Kept as a verified negative result + alternative formulation
    (tests/test_quant_extras.py pins its numerical equivalence).
    """
    key = (cfg.img_hw, cfg.patch_size, cfg.patch_stride, cfg.patch_padding,
           cfg.token_hw)
    if key not in _TOKEN_OP_CACHE:
        _TOKEN_OP_CACHE[key] = _token_operator(cfg)
    k = cfg.patch_size
    th, tw = cfg.token_hw
    h, w = cfg.img_hw
    b = x.shape[0]
    dt = dtype or x.dtype
    f32 = jnp.float32

    key2 = key + (cfg.E,)
    if key2 not in _TOKEN_OP2_CACHE:
        import numpy as np

        ah_np, aw_np = _TOKEN_OP_CACHE[key]
        # (H, th, dy) flattened -> columns ordered th-major, dy-minor.
        aht = ah_np.transpose(2, 1, 0).reshape(h, th * k)
        _TOKEN_OP2_CACHE[key2] = (aht, aw_np)
    aht_np, aw_np = _TOKEN_OP2_CACHE[key2]

    aht = jnp.asarray(aht_np, dt)                    # (H, th*k)
    # N[W, dy, tw, e] = sum_dx Aw[dx, tw, W] * w_conv[e, dy, dx] — built
    # from the (traced) conv weight so updated params flow through.
    wk = p["conv"]["w"].reshape(cfg.E, k, k)         # (E, dy, dx)
    n_mat = jnp.einsum(
        "xtw,edx->wdte", jnp.asarray(aw_np, f32), wk.astype(f32)
    ).astype(dt)                                     # (W, dy, tw, E)

    xs = x.reshape(b, h, w).astype(dt)
    # GEMM 1 (contract H): (B, H, W) x (H, th*k) -> (B, W, th*k).
    u = jax.lax.dot_general(
        xs, aht, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    u4 = u.astype(dt).reshape(b, w, th, k)
    # GEMM 2 (contract W, dy): -> (B, th, tw, E), reshape-free to (B,S,E).
    tokens = jax.lax.dot_general(
        u4, n_mat, (((1, 3), (0, 1)), ((), ())), preferred_element_type=f32
    ).reshape(b, th * tw, cfg.E)
    return tokens + p["conv"]["b"].astype(f32)


def pixel_shuffle_nhwc(x: jax.Array, r: int) -> jax.Array:
    """torch nn.PixelShuffle semantics on an NHWC array.

    (B, H, W, C*r^2) -> (B, H*r, W*r, C) with the NCHW channel index
    decomposed as c = c_out*r^2 + dy*r + dx (torch's convention), so the
    values match utils.image.pixel_shuffle exactly after layout transpose.
    """
    b, h, w, c = x.shape
    oc = c // (r * r)
    y = x.reshape(b, h, w, oc, r, r)  # (..., c_out, dy, dx)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # (B, H, dy, W, dx, c_out)
    return y.reshape(b, h * r, w * r, oc)


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
