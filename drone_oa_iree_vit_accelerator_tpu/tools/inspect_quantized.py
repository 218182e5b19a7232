"""Quantized-model inspector — scale/range dumps for quantization health.

Mirrors the reference's introspection scripts (tests/check_quantization.py
weight-int-range + input-quantizer dump; tests/inspect_quantized_model.py
per-stage int/float ranges and scales): given converted integer
parameters, print every stage's weight range, activation scale, and
requant encoding, flagging degenerate cases (saturated weights, shifts
out of range, unused int range).

    python -m drone_oa_iree_vit_accelerator_tpu.tools.inspect_quantized \
        [--int-params model_quantized_final.npz]
"""

from __future__ import annotations

import json

import jax
import numpy as np

from ..ops.integer_ita import IntAttentionParams, IntFFNParams, QuantLinearParams


def _lin_report(name: str, p: QuantLinearParams) -> dict:
    w = np.asarray(p.w)
    used = max(abs(int(w.min())), abs(int(w.max())))
    rep = {
        "layer": name,
        "weight_int_range": [int(w.min()), int(w.max())],
        "weight_range_utilization": round(used / 127.0, 3),
        "bias_int32_absmax": int(np.abs(np.asarray(p.b)).max()),
        "s_in": float(np.asarray(p.s_in)),
        "s_w": float(np.asarray(p.s_w)),
        "s_out": float(np.asarray(p.s_out)),
        "requant": {"mult": int(p.mult), "shift": int(p.shift), "add": int(p.add)},
    }
    rep["warnings"] = _warnings(rep)
    return rep


def _warnings(rep: dict) -> list[str]:
    out = []
    if rep["weight_range_utilization"] < 0.5:
        out.append("weights use <50% of the int8 range (scale too wide)")
    if not (0 < rep["requant"]["mult"] <= 256):
        out.append("multiplier outside 8-bit range")
    if not (0 <= rep["requant"]["shift"] <= 31):
        out.append("shift outside int32-safe range")
    return out


def inspect_attention(i: int, a: IntAttentionParams) -> list[dict]:
    rows = [
        _lin_report(f"block{i}.attn.q_proj", a.q),
        _lin_report(f"block{i}.attn.k_proj", a.k),
        _lin_report(f"block{i}.attn.v_proj", a.v),
    ]
    rows.append(
        {
            "layer": f"block{i}.attn.qk_matmul",
            "requant": {"mult": int(a.qk_mult), "shift": int(a.qk_shift),
                        "add": int(a.qk_add)},
        }
    )
    rows.append(
        {
            "layer": f"block{i}.attn.softmax",
            "note": "fixed output scale 1/255, zero point 0 (uint8)",
        }
    )
    rows.append(
        {
            "layer": f"block{i}.attn.av_matmul",
            "requant": {"mult": int(a.av_mult), "shift": int(a.av_shift),
                        "add": int(a.av_add)},
        }
    )
    rows.append(_lin_report(f"block{i}.attn.out_proj", a.o))
    rows.append(
        {
            "layer": f"block{i}.attn.io_scales",
            "s_in": float(np.asarray(a.s_in)),
            "s_out": float(np.asarray(a.s_out)),
        }
    )
    return rows


def inspect_ffn(i: int, f: IntFFNParams) -> list[dict]:
    return [
        _lin_report(f"block{i}.ffn.fc1", f.fc1),
        {
            "layer": f"block{i}.ffn.relu",
            "requant": {"mult": int(f.relu_mult), "shift": int(f.relu_shift),
                        "add": int(f.relu_add)},
        },
        _lin_report(f"block{i}.ffn.fc2", f.fc2),
    ]


def inspect(int_params: dict) -> list[dict]:
    rows: list[dict] = []
    for i, a in enumerate(int_params["attn"]):
        rows.extend(inspect_attention(i, a))
    for i, f in enumerate(int_params["ffn"]):
        rows.extend(inspect_ffn(i, f))
    return rows


def main() -> None:
    import argparse

    from ..core.config import MODEL_ZOO
    from ..models import params_io, vit_lstm as M
    from ..pipeline.serve import _calibrate_random

    ap = argparse.ArgumentParser()
    ap.add_argument("--int-params", default=None)
    ap.add_argument("--model", default="ITA_single_layer_upsample_shuffle")
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    cfg = MODEL_ZOO[args.model]
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    like = _calibrate_random(cfg, params)
    if args.int_params:
        ip = params_io.load_params(args.int_params, like)
    else:
        ip = like  # randomly-calibrated demo
    for row in inspect(ip):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
