"""Closed-loop fleet evaluation over UDP vs the in-jit rollout (TPU).

The reference's evaluation topology is sim -> UDP -> device -> UDP ->
sim (launch_evaluation_FPGA.bash; SURVEY.md section 3.6). This script
runs that topology at fleet scale — N drones fly N held-out worlds
simultaneously through ONE FleetEngine UDP server (native C++ loop) —
and compares per-world outcomes against the in-jit batched rollout
(sim/rollout.rollout_batch, path='turbo': the same math the fleet step
runs) on the same worlds with the same deployed checkpoint.

Writes docs/fleet_eval.json. Run on the TPU:
    python scripts/fleet_eval.py [--drones 16] [--steps 2000]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from drone_oa_iree_vit_accelerator_tpu.core import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (  # noqa: E402
    FleetEngine,
)
from drone_oa_iree_vit_accelerator_tpu.quant.batched import make_tail  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import (  # noqa: E402
    rollout_batch,
    sample_worlds,
)
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.tools.fleet_eval import (  # noqa: E402
    fleet_closed_loop_eval,
)

HELDOUT_SEED = 990_000  # same held-out world stream as the policy report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--drones", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--vel", type=float, default=5.0)
    args = ap.parse_args()

    repo = pathlib.Path(__file__).resolve().parents[1]
    # Same checkpoint/int8 resolution as the serving engines (one copy).
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        _resolve_params,
    )

    params, int_params = _resolve_params(
        CFG, None, None, str(repo / "checkpoints")
    )

    wcfg = WorldConfig()
    worlds = sample_worlds(jax.random.PRNGKey(HELDOUT_SEED), args.drones, wcfg)

    # In-jit reference rollout (same math as the fleet step: turbo path).
    tail = make_tail(CFG, params)
    t0 = time.time()
    ref = jax.block_until_ready(
        jax.jit(
            lambda p, ip, w: rollout_batch(
                CFG, p, ip, w, wcfg=wcfg, steps=args.steps,
                desired_vel=args.vel, path="turbo",
            )
        )(params, (int_params, tail), worlds)
    )
    t_jit = time.time() - t0
    ref_success = np.asarray(ref.success)
    ref_collided = np.asarray(ref.collided)

    # UDP fleet closed loop on the same worlds.
    engine = FleetEngine(
        CFG, params=params, int_params=int_params,
        capacity=args.drones, idle_reset_s=3600.0,
    )
    t0 = time.time()
    res = fleet_closed_loop_eval(
        engine, worlds, wcfg=wcfg, steps=args.steps, desired_vel=args.vel,
        native=True,
    )
    t_udp = time.time() - t0

    agree_success = res["success"] == ref_success
    agree_collided = res["collided"] == ref_collided
    report = {
        "drones": args.drones,
        "steps": args.steps,
        "desired_vel": args.vel,
        "world_seed": HELDOUT_SEED,
        "udp_fleet": {
            "success_rate": round(float(res["success"].mean()), 4),
            "collision_rate": round(float(res["collided"].mean()), 4),
            "per_world_success": res["success"].astype(int).tolist(),
            "wall_s": round(t_udp, 1),
            "frames_served": engine.frames,
        },
        "injit_rollout": {
            "success_rate": round(float(ref_success.mean()), 4),
            "collision_rate": round(float(ref_collided.mean()), 4),
            "per_world_success": ref_success.astype(int).tolist(),
            "wall_s_incl_compile": round(t_jit, 1),
        },
        "per_world_outcome_agreement": {
            "success": int(agree_success.sum()),
            "collided": int(agree_collided.sum()),
            "of": args.drones,
        },
        "note": "UDP fleet = sim -> wire -> batched TPU server -> wire "
                "(reference topology, SURVEY 3.6) with per-drone LSTM "
                "slots; in-jit = sim/rollout.rollout_batch path='turbo' "
                "(same model math). Outcome differences, if any, come "
                "from batch-shape f32 summation in the float glue "
                "compounding over the horizon on knife-edge worlds.",
    }
    out = repo / "docs" / "fleet_eval.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
