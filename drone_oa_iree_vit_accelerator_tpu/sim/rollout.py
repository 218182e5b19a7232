"""Batched closed-loop rollouts: render -> policy -> dynamics under scan.

The TPU replacement for the reference's evaluation driver
(launch_evaluation_FPGA.bash: N sequential ROS rollouts with a 300 s
watchdog): here N drones × W worlds run *in parallel inside one jitted
program* — the control loop is a lax.scan over time with the policy,
camera, and dynamics fused. Batch shards over the device mesh
('batch' axis) for multi-chip throughput.
"""

from __future__ import annotations

import functools
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


def _policy_step(cfg, params, int_params, images_u8, vel_des, state, path,
                 pos_x=None, softmax_mode="onepass"):
    """Batched policy: (B,60,90) u8 -> (B,3) cmd; post-processing in-jit.

    Returns (cmd, new_state, postprocessed): for most paths ``cmd`` is
    the RAW model output (postprocessed=False, the rollout tick applies
    postprocess_velocity); the 'mega' megakernel path postprocesses
    in-kernel (model_kernel._lstm_head_postprocess) and returns the
    final velocity (postprocessed=True).
    """
    frames = images_u8.astype(jnp.float32)[:, None, :, :] / 255.0
    b = frames.shape[0]
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    if path == "pallas":
        interp = jax.default_backend() != "tpu"
        cmd, new_state = QZ.pallas_forward(
            cfg, params, int_params, frames, vel_des[:, None], quat, state,
            interpret=interp, softmax_mode=softmax_mode,
        )
    elif path == "int8":
        cmd, new_state = QZ.int8_forward(
            cfg, params, int_params, frames, vel_des[:, None], quat, state,
            softmax_mode=softmax_mode,
        )
    elif path == "turbo":
        # int_params slot: (int_params, TailMatrix) for the batched path.
        from ..quant.batched import turbo_forward

        ip, tail = int_params
        interp = jax.default_backend() != "tpu"
        cmd, new_state = turbo_forward(
            cfg, params, ip, tail, frames, vel_des[:, None], quat, state,
            encoder="pallas_T",
            interpret=interp, softmax_mode=softmax_mode,
        )
    elif path == "mega":
        # The serving megakernel, exactly as deployed (batch-1 program):
        # tokenizer in XLA on the full batch, then one kernel call per
        # drone under lax.map (sequential — the kernel includes the LSTM
        # tail + velocity postprocess, model_kernel.py). params carries
        # the FlagshipKernelParams operand pytree.
        from ..models import layers as L
        from ..ops.pallas.model_kernel import flagship_fused_step

        step1 = functools.partial(
            flagship_fused_step,
            interpret=jax.default_backend() != "tpu",  # interpret off-TPU
            softmax_mode=softmax_mode,
        )
        kp = params
        tokens = L.tokenizer_preln_nhwc(frames, kp.tok, cfg)  # (B, S, E)
        eye = jnp.eye(tokens.shape[-1], dtype=tokens.dtype)
        tokens = jax.lax.dot_general(
            tokens, eye, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

        def one(args):
            tok, v, px, q, h, c = args
            cmd, h2, c2 = step1(kp, tok, v, px, q[None, :], h, c)
            return cmd, h2, c2

        h_b = jnp.moveaxis(state.h, 1, 0)[:, :, None, :]  # (B, L, 1, H)
        c_b = jnp.moveaxis(state.c, 1, 0)[:, :, None, :]
        cmds, h2, c2 = jax.lax.map(
            one, (tokens, vel_des, pos_x, quat, h_b, c_b)
        )
        new_state = M.LSTMState(
            jnp.moveaxis(h2[:, :, 0, :], 0, 1), jnp.moveaxis(c2[:, :, 0, :], 0, 1)
        )
        return cmds, new_state, True
    elif path == "vitfly_f32":
        # The vitfly (upstream ITALSTM) float family — cfg must be a
        # VitflyConfig (models/vitfly.py).
        from ..models import vitfly as VF

        cmd, new_state = VF.forward(
            cfg, params, frames, vel_des[:, None], quat, state
        )
    elif path in ("vitfly_int8", "vitfly_pallas"):
        # True integer vitfly attention (quant/vitfly_qat.py);
        # 'vitfly_pallas' runs each block as one fused Pallas kernel.
        from ..quant.vitfly_qat import vitfly_int8_forward

        cmd, new_state = vitfly_int8_forward(
            cfg, params, int_params, frames, vel_des[:, None], quat, state,
            use_kernel=(path == "vitfly_pallas"),
            interpret=jax.default_backend() != "tpu",
        )
    else:
        cmd, new_state = M.forward(
            cfg, params, frames, vel_des[:, None], quat, state
        )
    return cmd, new_state, False


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
    softmax_mode: str = "onepass",
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

    # World tuple for per-drone vmaps (kinds only when present so legacy
    # sphere-only worlds keep their jaxpr unchanged).
    wtup = (
        (worlds.centers, worlds.radii)
        if worlds.kinds is None
        else (worlds.centers, worlds.radii, worlds.kinds)
    )

    def tick(carry: Carry, t):
        drone, lstm = carry.drone, carry.lstm
        images = jax.vmap(lambda w, p: render_depth(World(*w), p, wcfg))(
            wtup, drone.pos
        )
        if path == "expert":
            # Scripted-expert ceiling (the DAgger teacher,
            # train/dataset.expert_command): same worlds, same dynamics,
            # privileged world state instead of the camera — the
            # upper-bound row for attributing residual policy failures
            # (policy gap vs impossible worlds).
            from ..train.dataset import expert_command

            cmd_raw = jax.vmap(
                lambda w, p, v: expert_command(World(*w), p, v, wcfg)
            )(wtup, drone.pos, vel_des)
            cmd, lstm_new = cmd_raw, lstm
        else:
            cmd_raw, lstm_new, postprocessed = _policy_step(
                cfg, params, int_params, images, vel_des, lstm, path,
                pos_x=drone.pos[:, 0], softmax_mode=softmax_mode,
            )
            if postprocessed:  # mega path postprocesses in-kernel
                cmd = cmd_raw
            else:
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
            wtup, drone_new.pos
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
