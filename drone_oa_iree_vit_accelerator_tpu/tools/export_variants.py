"""Export-variant demo: dummy-block artifact -> real-kernel artifact swap.

The reference's export story stages the accelerator region as a
``DummyHardwareBlock`` computing x+x (flagship,
models/ITA_single_layer_upsample_shuffle/export/model.py:12-129) or
neg/abs (base, models/ITA/export/ITA_ONNX.py:15-38), transfers trained
weights into the export model via ``load_state_dict(strict=False)``, and
lets the compile-time transform spec pattern-match the placeholder and
splice in the external ITA object (plugin/ITA_spec.mlir:69-101).

The TPU-native equivalents, demonstrated end to end by this tool:

1. the placeholder artifact: ``pipeline/aot.export_serving_step(path=
   'dummy')`` — same model, accelerator region = x+x;
2. trained-weight transfer: the same params pytree loads into every
   variant (the quantized blocks' weights simply go unused by the dummy,
   the strict=False analog);
3. the swap: re-export with ``path='mega'`` (or 'pallas') — the function
   boundary replaces IR pattern-matching, so "splicing in the
   accelerator" is exporting the same weights through a different block
   implementation. Both artifacts carry identical wire metadata and are
   drop-in for the serving loop.

    python -m drone_oa_iree_vit_accelerator_tpu.tools.export_variants \
        [--checkpoint-dir checkpoints] [--out-dir /tmp]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from ..models import params_io, vit_lstm as M
from ..pipeline.aot import export_serving_step, load_serving_step
from ..quant.ptq import calibrate_ptq


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out-dir", default="/tmp")
    ap.add_argument("--real-path", default="mega",
                    choices=("mega", "pallas", "int8"))
    args = ap.parse_args(argv)

    params = M.init_params(CFG, jax.random.PRNGKey(0))
    if args.checkpoint_dir:
        ckpt = pathlib.Path(args.checkpoint_dir)
        params = params_io.load_params(
            str(ckpt / "model_float.npz"), params
        )
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (8, 1, 60, 90), 0, 256, jnp.uint8
    )
    int_params, _ = calibrate_ptq(CFG, params, frames)

    out = pathlib.Path(args.out_dir)
    art_dummy = export_serving_step(
        out / "model_dummy.jaxexport", CFG, params=params,
        int_params=int_params, path="dummy",
    )
    art_real = export_serving_step(
        out / "model_real.jaxexport", CFG, params=params,
        int_params=int_params, path=args.real_path,
    )

    # Drive both artifacts on the same frame.
    img = jax.random.randint(jax.random.PRNGKey(2), (60, 90), 0, 256, jnp.uint8)
    vel, quat = jnp.float32(5.0), jnp.asarray([1.0, 0, 0, 0], jnp.float32)

    outs = {}
    for name, art in (("dummy", art_dummy), ("real", art_real)):
        step, _, _, meta = load_serving_step(art)
        cmd, _ = step(img, vel, jnp.float32(3.0), quat, M.zero_state(CFG, 1))
        outs[name] = np.asarray(cmd)
        assert np.all(np.isfinite(outs[name])), name
        assert meta["wire"] == {"request": 5424, "reply": 12}

    diff = float(np.max(np.abs(outs["dummy"] - outs["real"])))
    report = {
        "dummy_artifact": {"path": str(art_dummy),
                           "bytes": art_dummy.stat().st_size,
                           "cmd": outs["dummy"].tolist()},
        "real_artifact": {"path": str(art_real),
                          "bytes": art_real.stat().st_size,
                          "impl": args.real_path,
                          "cmd": outs["real"].tolist()},
        "placeholder_differs_from_real": diff > 1e-3,
        "max_abs_cmd_diff": diff,
        "note": "same weights, same wire format; the accelerator region "
        "swaps at the function boundary instead of IR pattern matching",
    }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
