"""Operating-envelope sweep of the deployed artifact (VERDICT r2 item 5).

The reference's closed-loop driver takes the desired velocity as an
argument and its whole premise is speed-dependent difficulty
(/root/reference/launch_evaluation_FPGA.bash `<vel>` param); Flightmare
scenes mix obstacle geometries and densities. Round 2 measured one
operating point only (5 m/s, 24 spheres). This sweeps the DEPLOYED
artifact over:

- desired_vel in {3, 5, 7} m/s
- obstacle density in {16, 24, 36} spheres
- one non-sphere geometry point: 24 obstacles, 30% vertical cylinders
  (infinite pillars — the tree/pole geometry, sim/world.py kinds=1)

with f32 / int8 / pallas paths per point and a per-world int8==pallas
outcome-identity check throughout. desired_vel is threaded as a TRACED
jit argument so each (world-shape, path) program compiles once and is
reused across all velocities (12 compiles for 36 rollout calls).

Writes checkpoints/envelope_sweep.json. Run on the chip (~15 min):

    python scripts/envelope_sweep.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.core.config import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import (  # noqa: E402
    calibrate_ptq,
)
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import (  # noqa: E402
    rollout_batch,
    sample_worlds,
)
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402

SWEEP_SEED = 990_000  # the held-out world stream (untouched by training)
# 3400 steps for EVERY point (vs 2000 in the held-out block): at
# desired_vel=3 the goal is ~20.7 s away and a 2000-step (20 s) horizon
# times every rollout out — expert included — so the slow operating
# point needs the longer episode; one horizon for all points keeps the
# compile shared and the within-sweep comparison apples-to-apples.
N, STEPS = 64, 3400
VELS = (3.0, 5.0, 7.0)
SHAPES = [
    ("spheres16", WorldConfig(n_obstacles=16)),
    ("spheres24", WorldConfig()),
    ("spheres36", WorldConfig(n_obstacles=36)),
    ("cyl24_30pct", WorldConfig(cylinder_frac=0.3)),
]
PATHS = ("expert", "f32", "int8", "pallas")


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--softmax-mode", default="onepass",
                    choices=["onepass", "streaming"],
                    help="integer softmax mode for the quantized paths; "
                    "'streaming' sweeps the SHIPPED hardware-default mode "
                    "and writes envelope_sweep_streaming.json")
    args = ap.parse_args()
    root = pathlib.Path(__file__).resolve().parents[1]
    ckpt = root / "checkpoints"
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    params = params_io.load_params(str(ckpt / "model_float.npz"), params)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, "uint8")
    int_params, _ = calibrate_ptq(CFG, params, frames_cal)
    int_params = params_io.load_params(str(ckpt / "model_int8.npz"), int_params)

    t0 = time.time()
    rows = []
    identity_all = True
    for shape_name, wcfg in SHAPES:
        worlds = sample_worlds(
            jax.random.fold_in(jax.random.PRNGKey(SWEEP_SEED), 1), N, wcfg
        )
        # One compile per (shape, path); desired_vel is a traced arg.
        runs = {
            path: jax.jit(
                lambda p, ip, w, v, _wcfg=wcfg, _path=path: rollout_batch(
                    CFG, p, ip, w, wcfg=_wcfg, steps=STEPS,
                    desired_vel=v, path=_path,
                    softmax_mode=args.softmax_mode,
                )
            )
            for path in PATHS
        }
        for vel in VELS:
            point = {"shape": shape_name, "n_obstacles": wcfg.n_obstacles,
                     "cylinder_frac": wcfg.cylinder_frac, "vel": vel}
            outcomes = {}
            for path in PATHS:
                p = None if path == "expert" else params
                ip = None if path in ("expert", "f32") else int_params
                r = jax.block_until_ready(runs[path](p, ip, worlds, vel))
                succ = np.asarray(r.success)
                coll = np.asarray(r.collided)
                outcomes[path] = (succ, coll)
                point[path] = {
                    "success_rate": round(float(succ.mean()), 4),
                    "collision_rate": round(float(coll.mean()), 4),
                    "mean_time_to_goal": round(
                        float(np.asarray(r.time_to_goal)[succ].mean())
                        if succ.any() else float("nan"), 2),
                }
            ident = bool(
                np.array_equal(outcomes["int8"][0], outcomes["pallas"][0])
                and np.array_equal(outcomes["int8"][1], outcomes["pallas"][1])
            )
            point["int8_pallas_identical_per_world"] = ident
            identity_all &= ident
            rows.append(point)
            print(f"[{time.time()-t0:6.0f}s] {shape_name} v={vel}: " +
                  " ".join(f"{p}={point[p]['success_rate']:.3f}"
                           for p in PATHS) + f" ident={ident}", flush=True)

    out = {
        "worlds_per_point": N,
        "steps": STEPS,
        "seed": SWEEP_SEED,
        "paths": list(PATHS),
        "int8_pallas_identical_all_points": identity_all,
        "softmax_mode": args.softmax_mode,
        "rows": rows,
        "note": "expert = scripted DAgger teacher (privileged world state)"
                " — the per-point ceiling; deployed artifact = "
                "checkpoints/model_{float,int8}.npz",
    }
    fname = ("envelope_sweep.json" if args.softmax_mode == "onepass"
             else "envelope_sweep_streaming.json")
    with open(ckpt / fname, "w") as f:
        json.dump(out, f, indent=2)
    print(f"done -> {ckpt}/{fname}")


if __name__ == "__main__":
    main()
