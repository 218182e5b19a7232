"""Stage test-vector export — the ``export_hwpe`` analog.

The reference's verifier doubles as an RTL-testbench generator: it dumps
every pipeline stage's int tensors as HWPE simvectors into
``data_S{S}_E{E}_P{P}_F{F}_H{H}_B{bias}_{Act}/`` (reference
tests/export_and_validation_W_B.py:342-354, 555). The equivalent here
dumps the golden integer pipeline's stage tensors, weights, biases, and
requant parameters — usable to drive any external implementation
(an RTL testbench, a different accelerator port, a new kernel) against
the exact same vectors.

    python -m drone_oa_iree_vit_accelerator_tpu.tools.export_test_vectors \
        --out vectors/ [--int-params model_int8.npz] [--seed 0]
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MODEL_ZOO, ModelConfig
from ..ops import integer_ita as II


def export_vectors(
    out_dir: str | pathlib.Path,
    cfg: ModelConfig,
    int_params: dict,
    x_i8: jax.Array | None = None,
    seed: int = 0,
) -> pathlib.Path:
    """Dump per-stage vectors for every quantized block of the model."""
    folder = (
        f"data_S{cfg.S}_E{cfg.E}_P{cfg.P}_F{cfg.F}_H{cfg.H}_B1_Relu"
    )
    out = pathlib.Path(out_dir) / folder
    out.mkdir(parents=True, exist_ok=True)

    if x_i8 is None:
        x_i8 = jax.random.randint(
            jax.random.PRNGKey(seed), (cfg.S, cfg.E), -128, 128, jnp.int8
        )

    manifest: dict = {"config": cfg.name, "blocks": []}
    x_cur = x_i8
    for li, (attn, ffn) in enumerate(
        zip(int_params["attn"], int_params["ffn"])
    ):
        _, astages = II.ita_attention_int8(x_cur, attn, collect_stages=True)
        ffn_in = astages["Out_soft_requant"]
        _, fstages = II.ita_ffn_int8(ffn_in, ffn, collect_stages=True)

        blk = {
            "layer": li,
            "input": np.asarray(x_cur),
            **{k: np.asarray(v) for k, v in astages.items()},
            "FF_in": np.asarray(ffn_in),
            **{k: np.asarray(v) for k, v in fstages.items()},
            # Weights/biases (PyITA naming: Wq..Wff2, Bq..Bff2).
            "Wq": np.asarray(attn.q.w), "Bq": np.asarray(attn.q.b),
            "Wk": np.asarray(attn.k.w), "Bk": np.asarray(attn.k.b),
            "Wv": np.asarray(attn.v.w), "Bv": np.asarray(attn.v.b),
            "Wo": np.asarray(attn.o.w), "Bo": np.asarray(attn.o.b),
            "Wff": np.asarray(ffn.fc1.w), "Bff": np.asarray(ffn.fc1.b),
            "Wff2": np.asarray(ffn.fc2.w), "Bff2": np.asarray(ffn.fc2.b),
        }
        np.savez(out / f"block_{li}.npz", **blk)
        # Human/RTL-readable flat dumps of the activations.
        for name in ("input", "Qp_requant", "A_requant", "A_partial_softmax",
                     "Out_soft_requant", "FF2p_requant"):
            np.savetxt(
                out / f"block{li}_{name}.txt",
                blk[name].reshape(blk[name].shape[0], -1),
                fmt="%d",
            )
        manifest["blocks"].append(
            {
                "layer": li,
                "quant_params": {
                    "q": [int(attn.q.mult), int(attn.q.shift), 0],
                    "k": [int(attn.k.mult), int(attn.k.shift), 0],
                    "v": [int(attn.v.mult), int(attn.v.shift), 0],
                    "qk": [int(attn.qk_mult), int(attn.qk_shift), 0],
                    "av": [int(attn.av_mult), int(attn.av_shift), 0],
                    "o": [int(attn.o.mult), int(attn.o.shift), 0],
                    "fc1": [int(ffn.fc1.mult), int(ffn.fc1.shift), 0],
                    "relu": [int(ffn.relu_mult), int(ffn.relu_shift), 0],
                    "fc2": [int(ffn.fc2.mult), int(ffn.fc2.shift), 0],
                },
            }
        )
        x_cur = fstages["FF2p_requant"]  # feed next block (int boundary)

    with open(out / "manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return out


def main() -> None:
    import argparse

    from ..models import params_io, vit_lstm as M
    from ..pipeline.serve import _calibrate_random

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="vectors")
    ap.add_argument("--model", default="ITA_single_layer_upsample_shuffle")
    ap.add_argument("--int-params", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    cfg = MODEL_ZOO[args.model]
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    like = _calibrate_random(cfg, params)
    ip = (
        params_io.load_params(args.int_params, like)
        if args.int_params
        else like
    )
    out = export_vectors(args.out, cfg, ip, seed=args.seed)
    print(f"wrote stage vectors to {out}")


if __name__ == "__main__":
    main()
