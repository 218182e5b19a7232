"""Vectorized obstacle world with a ray-cast depth camera, pure jnp.

The reference evaluates its policy closed-loop in ROS/Flightmare
(launch_evaluation_FPGA.bash, SURVEY.md section 3.6) — a Unity renderer
feeding 60x90 depth frames over UDP at camera rate. That stack is
unavailable and single-instance; the TPU-native replacement is a
*batched, differentiable-friendly* world: N drones roll out in lockstep
under vmap/lax.scan, the depth camera is an analytic sphere ray-caster,
and the whole control loop (render -> policy -> dynamics) is one XLA
program, shardable across chips on the batch axis.

Conventions (matching the vitfly task): +x is the flight direction, the
drone starts near x=0 and must reach x >= goal_x without hitting any
obstacle; the camera looks along +x; depth is encoded u8 with 0 = far
(matches a normalized inverse-depth style input — the policy is trained
in this same sim so the encoding is self-consistent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..pipeline.wire import IMAGE_SHAPE


class WorldConfig(NamedTuple):
    n_obstacles: int = 24
    arena_y: float = 10.0  # obstacles in y in [-arena_y, arena_y]
    arena_z: float = 6.0
    x_min: float = 4.0
    x_max: float = 56.0
    r_min: float = 0.4
    r_max: float = 1.5
    goal_x: float = 60.0
    collision_radius: float = 0.3  # drone body radius
    cam_fov_x: float = 1.5  # ~86 deg horizontal half-angle tan
    cam_fov_y: float = 1.0
    max_depth: float = 12.0
    dt: float = 0.01  # 100 Hz control (SURVEY.md section 5 long-axis note)
    vel_tau: float = 0.35  # first-order velocity tracking time constant
    spawn_z: float = 2.5
    cylinder_frac: float = 0.0  # fraction of obstacles that are pillars


class World(NamedTuple):
    centers: jax.Array  # (n_obs, 3)
    radii: jax.Array  # (n_obs,)
    # Obstacle kind per slot: 0 = sphere, 1 = vertical cylinder (an
    # infinite pillar along z — the tree/pole geometry Flightmare scenes
    # mix in). None (default) = all spheres (legacy worlds).
    kinds: jax.Array | None = None


class DroneState(NamedTuple):
    pos: jax.Array  # (3,)
    vel: jax.Array  # (3,)


def sample_world(key: jax.Array, cfg: WorldConfig = WorldConfig()) -> World:
    """Random obstacle field between start and goal."""
    kx, ky, kz, kr = jax.random.split(key, 4)
    n = cfg.n_obstacles
    centers = jnp.stack(
        [
            jax.random.uniform(kx, (n,), minval=cfg.x_min, maxval=cfg.x_max),
            jax.random.uniform(ky, (n,), minval=-cfg.arena_y, maxval=cfg.arena_y),
            jax.random.uniform(
                kz, (n,), minval=cfg.spawn_z - cfg.arena_z / 2,
                maxval=cfg.spawn_z + cfg.arena_z / 2,
            ),
        ],
        axis=1,
    )
    radii = jax.random.uniform(kr, (n,), minval=cfg.r_min, maxval=cfg.r_max)
    kinds = None
    if cfg.cylinder_frac > 0.0:
        kk = jax.random.fold_in(key, 7)
        kinds = (
            jax.random.uniform(kk, (n,)) < cfg.cylinder_frac
        ).astype(jnp.int32)
    return World(centers=centers, radii=radii, kinds=kinds)


def init_drone(cfg: WorldConfig = WorldConfig(), y: float = 0.0) -> DroneState:
    return DroneState(
        pos=jnp.asarray([0.0, y, cfg.spawn_z]),
        vel=jnp.zeros(3),
    )


def _camera_rays(cfg: WorldConfig) -> jax.Array:
    """(H*W, 3) unit ray directions in the world frame (camera along +x).

    Image rows sweep z (down = +row), columns sweep y.
    """
    h, w = IMAGE_SHAPE
    ys = jnp.linspace(cfg.cam_fov_x, -cfg.cam_fov_x, w)  # left -> right
    zs = jnp.linspace(cfg.cam_fov_y, -cfg.cam_fov_y, h)  # top -> bottom
    yy = jnp.tile(ys[None, :], (h, 1))
    zz = jnp.tile(zs[:, None], (1, w))
    d = jnp.stack([jnp.ones_like(yy), yy, zz], axis=-1).reshape(-1, 3)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def render_depth(
    world: World, pos: jax.Array, cfg: WorldConfig = WorldConfig()
) -> jax.Array:
    """Ray-cast depth frame (60, 90) u8 from ``pos`` looking along +x.

    0 = nothing in range; brighter = closer (inverse-depth encoding).
    """
    rays = _camera_rays(cfg)  # (P, 3)
    oc = world.centers - pos  # (n, 3)
    # Ray-sphere: t = b - sqrt(b^2 - c), b = oc.d, c = |oc|^2 - r^2.
    b = rays @ oc.T  # (P, n)
    c = jnp.sum(oc * oc, axis=-1) - world.radii**2  # (n,)
    disc = b * b - c[None, :]
    hit = (disc >= 0) & (b > 0)
    t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > 0), t, jnp.inf)
    if world.kinds is not None:
        # Ray-cylinder (infinite vertical pillar): intersect in the xy
        # plane. a = |d_xy|^2, b = oc_xy.d_xy, c = |oc_xy|^2 - r^2.
        d_xy = rays[:, :2]  # (P, 2)
        a_c = jnp.sum(d_xy * d_xy, axis=-1)  # (P,)
        b_c = d_xy @ oc[:, :2].T  # (P, n)
        c_c = jnp.sum(oc[:, :2] ** 2, axis=-1) - world.radii**2  # (n,)
        disc_c = b_c * b_c - a_c[:, None] * c_c[None, :]
        ok = (disc_c >= 0) & (b_c > 0) & (a_c[:, None] > 1e-9)
        t_c = (b_c - jnp.sqrt(jnp.maximum(disc_c, 0.0))) / jnp.maximum(
            a_c[:, None], 1e-9
        )
        t_c = jnp.where(ok & (t_c > 0), t_c, jnp.inf)
        t = jnp.where(world.kinds[None, :] == 1, t_c, t)
    depth = jnp.min(t, axis=-1)  # (P,)
    # Inverse-depth u8: 255 at contact, 0 beyond max range.
    inv = jnp.clip(1.0 - depth / cfg.max_depth, 0.0, 1.0)
    img = jnp.round(inv * 255.0).astype(jnp.uint8)
    return img.reshape(IMAGE_SHAPE)


def step_dynamics(
    state: DroneState, cmd_vel: jax.Array, cfg: WorldConfig = WorldConfig()
) -> DroneState:
    """First-order velocity tracking at dt (the sim's flight controller)."""
    alpha = cfg.dt / cfg.vel_tau
    vel = state.vel + alpha * (cmd_vel - state.vel)
    return DroneState(pos=state.pos + vel * cfg.dt, vel=vel)


def check_collision(
    world: World, pos: jax.Array, cfg: WorldConfig = WorldConfig()
) -> jax.Array:
    """True if the drone intersects any obstacle (or the ground)."""
    d = jnp.linalg.norm(world.centers - pos, axis=-1)
    if world.kinds is not None:
        d_xy = jnp.linalg.norm(world.centers[:, :2] - pos[:2], axis=-1)
        d = jnp.where(world.kinds == 1, d_xy, d)
    hit_obs = jnp.any(d < world.radii + cfg.collision_radius)
    return hit_obs | (pos[2] < 0.2)
