"""Sim world, depth camera, and batched rollout tests."""

import jax
import jax.numpy as jnp
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E
from drone_oa_iree_vit_accelerator_tpu.sim import rollout as R
from drone_oa_iree_vit_accelerator_tpu.sim import world as W


def test_depth_camera_sees_obstacle():
    wcfg = W.WorldConfig()
    # One big obstacle dead ahead.
    world = W.World(
        centers=jnp.asarray([[6.0, 0.0, wcfg.spawn_z]]),
        radii=jnp.asarray([1.5]),
    )
    pos = jnp.asarray([0.0, 0.0, wcfg.spawn_z])
    img = W.render_depth(world, pos, wcfg)
    assert img.shape == (60, 90)
    h, w = 30, 45  # image center looks straight down +x
    assert int(img[h, w]) > 100  # close obstacle -> bright
    assert int(img[0, 0]) == 0  # corner ray misses -> far
    # Moving closer brightens the center pixel.
    img2 = W.render_depth(world, jnp.asarray([2.0, 0.0, wcfg.spawn_z]), wcfg)
    assert int(img2[h, w]) > int(img[h, w])


def test_collision_detection():
    wcfg = W.WorldConfig()
    world = W.World(
        centers=jnp.asarray([[5.0, 0.0, 2.5]]), radii=jnp.asarray([1.0])
    )
    assert not bool(W.check_collision(world, jnp.asarray([0.0, 0.0, 2.5]), wcfg))
    assert bool(W.check_collision(world, jnp.asarray([4.5, 0.0, 2.5]), wcfg))
    # Ground collision.
    assert bool(W.check_collision(world, jnp.asarray([0.0, 0.0, 0.1]), wcfg))


def test_dynamics_tracks_command():
    wcfg = W.WorldConfig()
    s = W.init_drone(wcfg)
    cmd = jnp.asarray([5.0, 0.0, 0.0])
    for _ in range(300):  # 3 s
        s = W.step_dynamics(s, cmd, wcfg)
    assert float(s.vel[0]) > 4.9  # converged to commanded velocity
    assert float(s.pos[0]) > 10.0


def test_rollout_batch_runs_and_freezes_done():
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    # Empty worlds (no obstacles in the flight corridor) -> straight dash.
    wcfg = W.WorldConfig(n_obstacles=2, x_min=100.0, x_max=110.0, goal_x=8.0)
    worlds = R.sample_worlds(key, 4, wcfg)
    run = jax.jit(
        lambda p, w: R.rollout_batch(
            CFG, p, None, w, wcfg=wcfg, steps=600, desired_vel=5.0, path="f32"
        )
    )
    res = run(params, worlds)
    # The pos_x<2 floor guarantees forward motion; goal at 8 m in 6 s.
    assert bool(jnp.all(res.success)), np.asarray(res.final_x)
    assert bool(jnp.all(res.time_to_goal < 6.0))
    assert bool(jnp.all(~res.collided))


def test_rollout_collision_world():
    key = jax.random.PRNGKey(1)
    params = M.init_params(CFG, key)
    # A wall of huge obstacles right after the control-floor region: an
    # untrained random policy cannot avoid it.
    wcfg = W.WorldConfig(
        n_obstacles=24, x_min=5.5, x_max=6.5, r_min=3.0, r_max=4.0,
        arena_y=6.0, arena_z=2.0, goal_x=30.0,
    )
    worlds = R.sample_worlds(key, 2, wcfg)
    res = jax.jit(
        lambda p, w: R.rollout_batch(
            CFG, p, None, w, wcfg=wcfg, steps=500, desired_vel=5.0, path="f32"
        )
    )(params, worlds)
    assert bool(jnp.all(res.collided))
    assert bool(jnp.all(~res.success))
    # Frozen at collision: final_x short of the wall + margin.
    assert bool(jnp.all(res.final_x < 10.0))


def test_evaluate_summary_and_yaml(tmp_path):
    out = tmp_path / "evaluation.yaml"
    wcfg = W.WorldConfig(n_obstacles=2, x_min=100.0, x_max=110.0, goal_x=6.0)
    s = E.evaluate(
        n_rollouts=2, steps=400, out_yaml=str(out), wcfg=wcfg, path="f32"
    )
    assert s["rollouts"] == 2
    assert s["successes"] + s["collisions"] <= 2
    assert 0.0 <= s["success_rate"] <= 1.0
    text = out.read_text()
    assert "success_rate" in text and "per_rollout" in text
