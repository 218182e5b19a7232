"""Histogram-based PTQ calibration: percentile + entropy (KL) methods.

The reference keeps two backup quantization flows beside its QAT path —
onnxruntime ``quantize_static`` (tests/onnx_backup/quantize_ptq_onnx.py,
whose CalibrationMethod options are MinMax/Percentile/Entropy) and the
torchao PT2E configs (tests/p2e_backup/). quant/ptq.py covers the
moving-average min/max family; this module adds the histogram family as
a genuinely independent second flow:

- ``percentile``: clip threshold at the p-th percentile of |x| — robust
  to activation outliers that blow up a min/max scale;
- ``entropy``: TensorRT-style KL divergence minimization between the
  original |x| distribution and its clipped+quantized projection.

Both produce the SAME artifact type as the main flow (ObserverState
min/max -> quant.convert.convert_model int params), so every downstream
consumer (int8 XLA path, Pallas kernels, megakernel) works unchanged.

Stage points match the QAT observer set exactly (quant/qat.py docstring:
attn in/q/k/v/qk/av/out, ffn in/fc1/relu/fc2), captured from the float
pipeline with the integer-simulated softmax — the distributions the
hardware requantizes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models import vit_lstm as M
from ..ops.ita_softmax import ita_softmax_fakequant
from ..ops.quant import ObserverState
from .convert import convert_model
from .qat import AttnObservers, FFNObservers, QATObservers

N_BINS = 2048


class _StageSink:
    """Accumulates |x| histograms per stage across calibration batches.

    Streaming: each ``add`` folds the batch into a fixed-size (N_BINS)
    histogram immediately, so host memory is O(stages * N_BINS) instead
    of O(frames * stages * activation size). When a later batch exceeds
    the current top edge, the range grows by a power of two and the
    existing bins are re-binned pairwise — exact for linear edges rooted
    at 0 (old bin [i*w, (i+1)*w) lands wholly inside new bin i//2).
    """

    def __init__(self):
        self.maxes: dict[str, float] = {}
        self.hists: dict[str, tuple[np.ndarray, float]] = {}

    def add(self, name: str, x: jax.Array) -> None:
        a = np.abs(np.asarray(x, np.float32)).ravel()
        amax = float(a.max()) if a.size else 0.0
        hist, top = self.hists.get(
            name, (np.zeros(N_BINS, np.int64), 0.0)
        )
        if amax > top:
            if top > 0.0:
                factor = 1
                while top * factor < amax:
                    factor *= 2
                while factor > 1:
                    hist = np.concatenate(
                        [
                            hist.reshape(N_BINS // 2, 2).sum(axis=1),
                            np.zeros(N_BINS // 2, np.int64),
                        ]
                    )
                    top *= 2
                    factor //= 2
            else:
                top = max(amax, 1e-12)
        elif top == 0.0:
            # All-zero leading batch(es): degenerate [0, 0] edges would
            # silently drop every sample (np.histogram counts nothing
            # into equal edges). Seed a tiny positive top so zeros land
            # in bin 0; the power-of-two re-binning above keeps them in
            # bin 0 when a later batch establishes the real range.
            top = 1e-12
        h, _ = np.histogram(a, bins=np.linspace(0.0, top, N_BINS + 1))
        hist = hist + h
        self.hists[name] = (hist, top)
        self.maxes[name] = max(self.maxes.get(name, 0.0), amax)

    def histogram(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        hist, top = self.hists[name]
        edges = np.linspace(0.0, max(top, 1e-12), N_BINS + 1)
        return hist, edges


def _attn_capture(x, p, num_heads, softmax_mode, sink, prefix):
    b, s, _ = x.shape
    sink.add(f"{prefix}.in", x)
    q = x @ p["q"]["w"] + p["q"]["b"]
    k = x @ p["k"]["w"] + p["k"]["b"]
    v = x @ p["v"]["w"] + p["v"]["b"]
    sink.add(f"{prefix}.q", q)
    sink.add(f"{prefix}.k", k)
    sink.add(f"{prefix}.v", v)
    proj = q.shape[-1]
    d = proj // num_heads
    heads = lambda t: t.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhsd,bhtd->bhst", heads(q), heads(k))
    sink.add(f"{prefix}.qk", logits)
    probs = ita_softmax_fakequant(logits, mode=softmax_mode)
    ctx = jnp.einsum("bhst,bhtd->bhsd", probs, heads(v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, proj)
    sink.add(f"{prefix}.av", ctx)
    out = ctx @ p["o"]["w"] + p["o"]["b"]
    sink.add(f"{prefix}.out", out)
    return out


def _ffn_capture(x, p, sink, prefix):
    sink.add(f"{prefix}.in", x)
    h = x @ p["fc1"]["w"] + p["fc1"]["b"]
    sink.add(f"{prefix}.fc1", h)
    r = jax.nn.relu(h)
    sink.add(f"{prefix}.relu", r)
    y = r @ p["fc2"]["w"] + p["fc2"]["b"]
    sink.add(f"{prefix}.fc2", y)
    return y


def collect_stage_histograms(
    cfg: ModelConfig,
    params: dict,
    frames_u8: jax.Array,
    batch_size: int = 8,
    softmax_mode: str = "onepass",
) -> _StageSink:
    """Run calibration frames through the float pipeline (integer-sim
    softmax), recording |activation| histograms at every observer point."""
    sink = _StageSink()
    n = frames_u8.shape[0]
    batch_size = min(batch_size, n)

    def attn_fn(i, x):
        return _attn_capture(
            x, params["blocks"][i]["attn"], cfg.H, softmax_mode, sink,
            f"attn{i}",
        )

    def ffn_fn(i, x):
        return _ffn_capture(x, params["blocks"][i]["ffn"], sink, f"ffn{i}")

    for i in range(0, n - batch_size + 1, batch_size):
        fr = frames_u8[i : i + batch_size].astype(jnp.float32) / 255.0
        b = fr.shape[0]
        M.forward(
            cfg, params, fr,
            jnp.ones((b, 1)), jnp.zeros((b, 4)).at[:, 0].set(1.0),
            attn_fn=attn_fn, ffn_fn=ffn_fn,
        )
    return sink


def percentile_threshold(hist: np.ndarray, edges: np.ndarray,
                         pct: float = 99.99) -> float:
    cdf = np.cumsum(hist) / max(hist.sum(), 1)
    idx = int(np.searchsorted(cdf, pct / 100.0))
    return float(edges[min(idx + 1, len(edges) - 1)])


def entropy_threshold(hist: np.ndarray, edges: np.ndarray,
                      n_levels: int = 128) -> float:
    """TensorRT-style KL calibration: pick the clip threshold whose
    clipped + n_levels-quantized distribution has minimal KL divergence
    from the original histogram."""
    total = hist.sum()
    if total == 0:
        return float(edges[-1])
    best_kl, best_i = np.inf, N_BINS
    for i in range(n_levels, N_BINS + 1, 8):
        p = hist[:i].astype(np.float64).copy()
        p[i - 1] += hist[i:].sum()  # clip: outliers fold into last bin
        if p.sum() == 0:
            continue
        # Quantize the first i bins down to n_levels, then expand back.
        chunks = np.array_split(hist[:i].astype(np.float64), n_levels)
        q = np.zeros(i, np.float64)
        start = 0
        for c in chunks:
            m = c > 0
            if m.any():
                q[start : start + len(c)][m] = c.sum() / m.sum()
            start += len(c)
        pp = p / p.sum()
        qq = q / q.sum() if q.sum() > 0 else q
        mask = pp > 0
        kl = float(np.sum(pp[mask] * np.log(pp[mask] / np.maximum(qq[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return float(edges[best_i])


def calibrate_histogram(
    cfg: ModelConfig,
    params: dict,
    frames_u8: jax.Array,
    method: str = "percentile",
    pct: float = 99.99,
    per_channel: bool = False,
    softmax_mode: str = "onepass",
) -> tuple[dict, QATObservers]:
    """Histogram-calibrated PTQ: returns (int_params, observers), the same
    contract as quant.ptq.calibrate_ptq. ``method``: 'percentile' or
    'entropy'."""
    if method not in ("percentile", "entropy"):
        raise ValueError(method)
    sink = collect_stage_histograms(
        cfg, params, frames_u8, softmax_mode=softmax_mode
    )

    def state(name: str) -> ObserverState:
        hist, edges = sink.histogram(name)
        if method == "percentile":
            t = percentile_threshold(hist, edges, pct)
        else:
            t = entropy_threshold(hist, edges)
        t = max(t, 1e-9)
        return ObserverState(
            min_val=jnp.float32(-t), max_val=jnp.float32(t),
            initialized=jnp.ones((), jnp.bool_),
        )

    observers = QATObservers(
        attn=tuple(
            AttnObservers(
                in_=state(f"attn{i}.in"), q=state(f"attn{i}.q"),
                k=state(f"attn{i}.k"), v=state(f"attn{i}.v"),
                qk=state(f"attn{i}.qk"), av=state(f"attn{i}.av"),
                out=state(f"attn{i}.out"),
            )
            for i in range(cfg.num_layers)
        ),
        ffn=tuple(
            FFNObservers(
                in_=state(f"ffn{i}.in"), fc1=state(f"ffn{i}.fc1"),
                relu=state(f"ffn{i}.relu"), fc2=state(f"ffn{i}.fc2"),
            )
            for i in range(cfg.num_layers)
        ),
    )
    int_params = jax.jit(convert_model, static_argnums=(2, 3))(
        params, observers, cfg.H, per_channel
    )
    return int_params, observers
