"""Per-axis corridor-drift probe for DAgger collection (round-4 item 1).

The round-3 collapse attribution (checkpoints/policy_report.json,
label_intervention_probes) found the seeds-1/2 poison is the
sequence-level temporal structure of altitude-DRIFT flights. The
`max_drift_m` bound added in d42abf1 truncates on COMBINED
|(y, z-spawn_z)| — but expert dodges legitimately move y by meters
(arena_y = 10), so before rerunning the 3-seed pipeline this probe
measures, separately per axis, what drift healthy policies (seed-0
round-0) and poison policies (seed-1/2 round-0) actually produce
during on-policy collection. Output picks the bound.

Run: python scripts/drift_probe.py --tpu
"""

import argparse
import json
import pathlib
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.core.config import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (  # noqa: E402
    postprocess_velocity,
)
from drone_oa_iree_vit_accelerator_tpu.sim import world as W  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import (  # noqa: E402
    sample_worlds,
)
from drone_oa_iree_vit_accelerator_tpu.train.dataset import (  # noqa: E402
    expert_command,
)

WCFG = W.WorldConfig()


def collect_positions(params, worlds, steps, stride, desired_vel, expert):
    """Mirror of train/dagger._collect_batch recording positions."""
    b = worlds.radii.shape[0]
    drone0 = jax.vmap(lambda _: W.init_drone(WCFG))(jnp.arange(b))
    lstm0 = M.zero_state(CFG, b)
    vel_des = jnp.full((b,), desired_vel)
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)

    def segment(carry, t):
        drone, lstm, done = carry
        if expert:
            cmd = jax.vmap(
                lambda w, p: expert_command(W.World(*w), p, desired_vel, WCFG)
            )((worlds.centers, worlds.radii), drone.pos)
            lstm_new = lstm
        else:
            images = jax.vmap(
                lambda w, p: W.render_depth(W.World(*w), p, WCFG)
            )((worlds.centers, worlds.radii), drone.pos)
            frames = images.astype(jnp.float32)[:, None] / 255.0
            cmd_raw, lstm_new = M.forward(
                CFG, params, frames, vel_des[:, None], quat, lstm
            )
            cmd = jax.vmap(postprocess_velocity)(
                cmd_raw, vel_des, drone.pos[:, 0]
            )
        active = ~done
        cmd = jnp.where(active[:, None], cmd, 0.0)

        def dyn(s, _):
            return (
                jax.vmap(lambda ss, cc: W.step_dynamics(ss, cc, WCFG))(s, cmd),
                None,
            )

        drone_new, _ = jax.lax.scan(dyn, drone, None, length=stride)
        drone_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[:, None], new, old),
            drone_new, drone,
        )
        lstm_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[None, :, None], new, old),
            lstm_new, lstm,
        )
        hit = jax.vmap(lambda w, p: W.check_collision(W.World(*w), p, WCFG))(
            (worlds.centers, worlds.radii), drone_new.pos
        )
        reached = drone_new.pos[:, 0] >= WCFG.goal_x
        done_new = done | (hit & active) | reached
        return (drone_new, lstm_new, done_new), (drone.pos, active)

    (_, _, _), (pos, active) = jax.lax.scan(
        segment, (drone0, lstm0, jnp.zeros((b,), bool)),
        jnp.arange(steps // stride),
    )
    return pos, active  # (T,B,3), (T,B)


def stats(pos, active, name):
    y = np.abs(pos[:, :, 1])
    z = np.abs(pos[:, :, 2] - WCFG.spawn_z)
    comb = np.sqrt(pos[:, :, 1] ** 2 + (pos[:, :, 2] - WCFG.spawn_z) ** 2)
    rows = {}
    for label, d in (("abs_y", y), ("abs_z_drift", z), ("combined", comb)):
        vals = d[active]
        per_traj_max = np.array(
            [d[active[:, i], i].max() if active[:, i].any() else 0.0
             for i in range(pos.shape[1])]
        )
        rows[label] = {
            "frame_p50": round(float(np.percentile(vals, 50)), 2),
            "frame_p90": round(float(np.percentile(vals, 90)), 2),
            "frame_p99": round(float(np.percentile(vals, 99)), 2),
            "traj_max_p50": round(float(np.percentile(per_traj_max, 50)), 2),
            "traj_max_p90": round(float(np.percentile(per_traj_max, 90)), 2),
            "traj_max_max": round(float(per_traj_max.max()), 2),
        }
    print(f"== {name}")
    print(json.dumps(rows, indent=1))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", default="/tmp/drift_probe.json")
    args = ap.parse_args()

    t0 = time.time()
    out = {}
    p0 = M.init_params(CFG, jax.random.PRNGKey(0))
    run = jax.jit(
        lambda p, w, e: collect_positions(p, w, args.steps, 5, 5.0, e),
        static_argnums=2,
    )

    # Expert (ground truth healthy distribution).
    worlds1 = sample_worlds(
        jax.random.fold_in(jax.random.PRNGKey(107_001), 1), args.n, WCFG
    )
    pos, act = jax.block_until_ready(run(p0, worlds1, True))
    out["expert"] = stats(
        np.asarray(pos), np.asarray(act), f"expert ({time.time()-t0:.0f}s)"
    )

    for s, wd in ((0, "w0"), (1, "w1"), (2, "w2")):
        params = params_io.load_params(
            f"/tmp/doa_dagger_{wd}/params_round0.npz", p0
        )
        # Exact round-1 collection worlds (collect_policy_trajectories
        # samples from fold_in(PRNGKey(world_seed0 + k), 1)).
        worlds = sample_worlds(
            jax.random.fold_in(
                jax.random.PRNGKey(7000 + s * 100_000 + 1), 1
            ),
            args.n, WCFG,
        )
        pos, act = jax.block_until_ready(run(params, worlds, False))
        out[f"seed{s}_round0_policy"] = stats(
            np.asarray(pos), np.asarray(act),
            f"seed{s} round-0 policy ({time.time()-t0:.0f}s)",
        )

    json.dump(out, open(args.out, "w"), indent=1)
    print(f"-> {args.out} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
