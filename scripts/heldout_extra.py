"""Held-out 64-world rows the round-2 report lacked (VERDICT r2 item 4 /
ADVICE r2 medium):

- ``expert``: the scripted expert's closed-loop success on the SAME 64
  held-out worlds — the ceiling row that attributes the policy's residual
  failures (policy gap vs impossible worlds). Mirrors the reference's
  anchoring of the metric in the sim's own success criteria
  (/root/reference/launch_evaluation_FPGA.bash:106-158).
- ``mega``: the whole-model megakernel serving path, closed loop, with a
  PER-WORLD outcome comparison against the pallas path — the artifact
  backing README's megakernel closed-loop claim.

Writes checkpoints/heldout_extra.json. Run on the chip:

    python scripts/heldout_extra.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.core.config import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)
from drone_oa_iree_vit_accelerator_tpu.quant import ptq as QZ  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402

HELDOUT_SEED = 990_000  # matches scripts/dagger_train.py
STEPS, N = 2000, 64
WCFG = WorldConfig()


def main() -> None:
    out = pathlib.Path(__file__).resolve().parents[1] / "checkpoints"
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    params = params_io.load_params(str(out / "model_float.npz"), params)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, "uint8")
    int_params, _ = QZ.calibrate_ptq(CFG, params, frames_cal)
    int_params = params_io.load_params(str(out / "model_int8.npz"), int_params)

    t0 = time.time()
    rows = {}
    per_world = {}
    for path in ("expert", "pallas", "mega"):
        s = E.evaluate(
            n_rollouts=N, steps=STEPS, seed=HELDOUT_SEED, path=path,
            params=None if path == "expert" else params,
            int_params=None if path == "expert" else int_params,
            wcfg=WCFG,
        )
        pw = s.pop("per_rollout")
        per_world[path] = [
            {"success": r["success"], "collision": r["collision"]} for r in pw
        ]
        rows[path] = s
        print(f"[{time.time()-t0:6.0f}s] {path}: {s}", flush=True)

    mega_vs_pallas_identical = per_world["mega"] == per_world["pallas"]
    n_world_diff = sum(
        a != b for a, b in zip(per_world["mega"], per_world["pallas"])
    )
    report = {
        "worlds": {"seed": HELDOUT_SEED, "n": N, "steps": STEPS},
        "rows": rows,
        "mega_vs_pallas_outcomes_identical": mega_vs_pallas_identical,
        "mega_vs_pallas_worlds_differing": n_world_diff,
        "per_world": per_world,
        "note": (
            "expert = scripted DAgger teacher on the same worlds (ceiling "
            "row); residual policy failures below it are policy gap, above "
            "it are worlds the expert itself cannot solve"
        ),
    }
    with open(out / "heldout_extra.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: rows[k]["success_rate"] for k in rows}
                     | {"mega==pallas": mega_vs_pallas_identical}))


if __name__ == "__main__":
    main()
