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
    ap.add_argument("--mesh", type=int, default=0,
                    help="also run the UDP loop through a FleetEngine "
                    "sharded over an N-device mesh and record outcome "
                    "agreement + throughput into MULTICHIP_THROUGHPUT"
                    ".json (wire transport x mesh sharding)")
    ap.add_argument("--cpu-mesh", action="store_true",
                    help="force the CPU backend with --mesh virtual "
                    "devices (the only way to get a >1-device mesh on a "
                    "1-chip host; env JAX_PLATFORMS is overridden by the "
                    "global axon init, so this must happen in-process)")
    ap.add_argument("--goal-x", type=float, default=None,
                    help="shrink the course (CPU interpret mode is "
                    "~2 s/tick; goal_x=6 + vel 3 finishes in ~250 ticks)")
    ap.add_argument("--obstacles", type=int, default=None)
    args = ap.parse_args()
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.mesh, 1))

    repo = pathlib.Path(__file__).resolve().parents[1]
    # Same checkpoint/int8 resolution as the serving engines (one copy).
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        _resolve_params,
    )

    params, int_params = _resolve_params(
        CFG, None, None, str(repo / "checkpoints")
    )

    wkw = {}
    if args.goal_x is not None:
        wkw["goal_x"] = args.goal_x
    if args.obstacles is not None:
        wkw["n_obstacles"] = args.obstacles
    wcfg = WorldConfig(**wkw)
    worlds = sample_worlds(jax.random.PRNGKey(HELDOUT_SEED), args.drones, wcfg)

    # In-jit reference rollout (same math as the fleet step: turbo path).
    tail = make_tail(CFG, params, e_major=True)
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
    # Off-TPU runs (the virtual-mesh CPU topology) must not clobber the
    # TPU-measured parity report.
    on_tpu = jax.default_backend() == "tpu"
    out = repo / "docs" / (
        "fleet_eval.json" if on_tpu else "fleet_eval_cpu.json"
    )
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))

    if args.mesh:
        # Wire transport x mesh sharding (VERDICT r3 item 8): the same
        # UDP closed loop, but the fleet server's slot axis is sharded
        # over an N-device mesh (capacity/N slots per device, params
        # replicated, zero cross-chip traffic per tick). Per-world
        # outcomes must match the single-device UDP run above.
        from drone_oa_iree_vit_accelerator_tpu.parallel.mesh import (
            make_mesh,
        )

        mesh = make_mesh(args.mesh)
        cap = args.drones
        if cap % args.mesh:
            cap = args.drones + args.mesh - args.drones % args.mesh
        eng_mesh = FleetEngine(
            CFG, params=params, int_params=int_params, capacity=cap,
            idle_reset_s=3600.0, mesh=mesh,
        )
        t0 = time.time()
        res_m = fleet_closed_loop_eval(
            eng_mesh, worlds, wcfg=wcfg, steps=args.steps,
            desired_vel=args.vel, native=True,
        )
        t_mesh = time.time() - t0
        section = {
            "topology": f"UDP wire -> FleetEngine sharded over "
                        f"{args.mesh} {mesh.devices.flat[0].platform} "
                        f"devices (capacity {cap})",
            "drones": args.drones,
            "control_ticks": args.steps,
            "success_rate": round(float(res_m["success"].mean()), 4),
            "per_world_outcomes_equal_vs_single_device_udp": bool(
                np.array_equal(res_m["success"], res["success"])
                and np.array_equal(res_m["collided"], res["collided"])
            ),
            "final_x_max_abs_diff_vs_single_device_udp": float(
                np.max(np.abs(res_m["final_x"] - res["final_x"]))
            ),
            "wall_s": round(t_mesh, 1),
            "frames_served": eng_mesh.frames,
            "frames_per_s_wall": round(eng_mesh.frames / t_mesh, 1),
            "note": "closes the last untested combination of (wire "
                    "transport x mesh sharding); on the virtual CPU mesh "
                    "parity, not speedup, is the deliverable",
        }
        mt_path = repo / "MULTICHIP_THROUGHPUT.json"
        mt = json.loads(mt_path.read_text()) if mt_path.exists() else {}
        key = f"udp_fleet_mesh{args.mesh}_" + (
            "cpu" if mesh.devices.flat[0].platform == "cpu" else "tpu"
        )
        mt[key] = section
        mt_path.write_text(json.dumps(mt, indent=2))
        print(json.dumps({key: section}, indent=1))


if __name__ == "__main__":
    main()
