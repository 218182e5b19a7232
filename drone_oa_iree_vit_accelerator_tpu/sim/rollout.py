"""Batched closed-loop rollouts: render -> policy -> dynamics under scan.

The TPU replacement for the reference's evaluation driver
(launch_evaluation_FPGA.bash: N sequential ROS rollouts with a 300 s
watchdog): here N drones × W worlds run *in parallel inside one jitted
program* — the control loop is a lax.scan over time with the policy,
camera, and dynamics fused. Batch shards over the device mesh
('batch' axis) for multi-chip throughput.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models import vit_lstm as M
from ..pipeline.serve import postprocess_velocity
from .. import quant as QZ
from .world import (
    DroneState,
    World,
    WorldConfig,
    check_collision,
    init_drone,
    render_depth,
    sample_world,
    step_dynamics,
)


class RolloutResult(NamedTuple):
    success: jax.Array  # (B,) bool — reached goal_x without collision
    collided: jax.Array  # (B,) bool
    time_to_goal: jax.Array  # (B,) f32 seconds (inf if not reached)
    mean_speed: jax.Array  # (B,) f32
    final_x: jax.Array  # (B,) f32


def _policy_step(cfg, params, int_params, images_u8, vel_des, state, path):
    """Batched policy: (B,60,90) u8 -> (B,3) cmd; post-processing in-jit."""
    frames = images_u8.astype(jnp.float32)[:, None, :, :] / 255.0
    b = frames.shape[0]
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    if path == "pallas":
        interp = jax.default_backend() != "tpu"
        cmd, new_state = QZ.pallas_forward(
            cfg, params, int_params, frames, vel_des[:, None], quat, state,
            interpret=interp,
        )
    elif path == "int8":
        cmd, new_state = QZ.int8_forward(
            cfg, params, int_params, frames, vel_des[:, None], quat, state
        )
    else:
        cmd, new_state = M.forward(
            cfg, params, frames, vel_des[:, None], quat, state
        )
    return cmd, new_state


def rollout_batch(
    cfg: ModelConfig,
    params: dict,
    int_params: dict | None,
    worlds: World,  # stacked: centers (B, n, 3), radii (B, n)
    *,
    wcfg: WorldConfig = WorldConfig(),
    steps: int = 1000,
    desired_vel: float = 5.0,
    path: str = "f32",
) -> RolloutResult:
    """Roll out B drones, one per world, for ``steps`` control ticks.

    Pure function — jit it with (params, int_params, worlds) as args.
    """
    b = worlds.radii.shape[0]
    drone0 = jax.vmap(lambda _: init_drone(wcfg))(jnp.arange(b))
    lstm0 = M.zero_state(cfg, b)
    vel_des = jnp.full((b,), desired_vel)

    class Carry(NamedTuple):
        drone: DroneState
        lstm: M.LSTMState
        collided: jax.Array
        done: jax.Array
        t_goal: jax.Array
        speed_sum: jax.Array

    def tick(carry: Carry, t):
        drone, lstm = carry.drone, carry.lstm
        images = jax.vmap(lambda w, p: render_depth(World(*w), p, wcfg))(
            (worlds.centers, worlds.radii), drone.pos
        )
        cmd_raw, lstm_new = _policy_step(
            cfg, params, int_params, images, vel_des, lstm, path
        )
        cmd = jax.vmap(postprocess_velocity)(
            cmd_raw, vel_des, drone.pos[:, 0]
        )
        # Freeze finished drones (collided or reached goal).
        active = ~carry.done
        cmd = jnp.where(active[:, None], cmd, 0.0)
        drone_new = jax.vmap(lambda s, c: step_dynamics(s, c, wcfg))(
            drone, cmd
        )
        drone_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[:, None], new, old),
            drone_new,
            drone,
        )
        lstm_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[None, :, None], new, old),
            lstm_new,
            lstm,
        )
        hit = jax.vmap(lambda w, p: check_collision(World(*w), p, wcfg))(
            (worlds.centers, worlds.radii), drone_new.pos
        )
        collided = carry.collided | (hit & active)
        reached = drone_new.pos[:, 0] >= wcfg.goal_x
        t_goal = jnp.where(
            active & reached & ~collided & jnp.isinf(carry.t_goal),
            (t + 1) * wcfg.dt,
            carry.t_goal,
        )
        done = carry.done | collided | reached
        speed_sum = carry.speed_sum + jnp.where(
            active, jnp.linalg.norm(drone_new.vel, axis=-1), 0.0
        )
        return (
            Carry(drone_new, lstm_new, collided, done, t_goal, speed_sum),
            None,
        )

    carry0 = Carry(
        drone=drone0,
        lstm=lstm0,
        collided=jnp.zeros((b,), bool),
        done=jnp.zeros((b,), bool),
        t_goal=jnp.full((b,), jnp.inf),
        speed_sum=jnp.zeros((b,)),
    )
    carry, _ = jax.lax.scan(tick, carry0, jnp.arange(steps))

    return RolloutResult(
        success=jnp.isfinite(carry.t_goal) & ~carry.collided,
        collided=carry.collided,
        time_to_goal=carry.t_goal,
        mean_speed=carry.speed_sum / steps,
        final_x=carry.drone.pos[:, 0],
    )


def sample_worlds(key: jax.Array, n: int, wcfg: WorldConfig = WorldConfig()) -> World:
    """Stack n random worlds along a leading batch axis."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: sample_world(k, wcfg))(keys)
