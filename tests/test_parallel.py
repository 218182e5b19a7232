"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.parallel import mesh as PM


def _batch(key, n):
    kf, kv, kt = jax.random.split(key, 3)
    return {
        "frame": jax.random.uniform(kf, (n, 1, 60, 90)),
        "vel": jnp.ones((n, 1)),
        "quat": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        "target": jax.random.normal(kt, (n, 3)),
    }


def test_mesh_has_8_devices():
    mesh = PM.make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_matches_single_device():
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    batch = _batch(key, 16)

    def loss_fn(p, b):
        cmd, _ = M.forward(CFG, p, b["frame"], b["vel"], b["quat"])
        return jnp.mean((cmd - b["target"]) ** 2)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    # Single-device reference step.
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, batch)
    updates_ref, _ = opt.update(grads_ref, opt_state, params)
    params_ref = optax.apply_updates(params, updates_ref)

    # 8-way DP step.
    mesh = PM.make_mesh()
    step = PM.data_parallel_step(loss_fn, mesh, opt)
    params_dp, _, loss_dp = step(
        PM.replicate(mesh, params),
        PM.replicate(mesh, opt_state),
        PM.shard_batch(mesh, batch),
    )

    assert np.isclose(float(loss_dp), float(loss_ref), atol=1e-6)
    for ref, dp in zip(
        jax.tree_util.tree_leaves(params_ref),
        jax.tree_util.tree_leaves(params_dp),
    ):
        np.testing.assert_allclose(np.asarray(ref), np.asarray(dp), atol=1e-5)


def test_inference_vmap_batch_sharded():
    key = jax.random.PRNGKey(1)
    params = M.init_params(CFG, key)
    mesh = PM.make_mesh()
    batch = _batch(key, 8)

    fwd = jax.jit(
        lambda p, f, v, q: M.forward(CFG, p, f, v, q)[0],
        in_shardings=(
            PM.replicated(mesh),
            PM.batch_sharding(mesh),
            PM.batch_sharding(mesh),
            PM.batch_sharding(mesh),
        ),
    )
    cmd = fwd(
        PM.replicate(mesh, params),
        *(PM.shard_batch(mesh, (batch["frame"], batch["vel"], batch["quat"])))
    )
    assert cmd.shape == (8, 3)
    assert bool(jnp.all(jnp.isfinite(cmd)))


def test_sharded_rollout_over_mesh():
    from drone_oa_iree_vit_accelerator_tpu.sim import rollout as R
    from drone_oa_iree_vit_accelerator_tpu.sim import world as W

    cfg = CFG
    wcfg = W.WorldConfig(n_obstacles=2, x_min=100.0, x_max=110.0, goal_x=4.0)
    key = jax.random.PRNGKey(0)
    params = M.init_params(cfg, key)
    worlds = R.sample_worlds(key, 8, wcfg)
    mesh = PM.make_mesh()

    def rollout_fn(p, ip, w):
        return R.rollout_batch(
            cfg, p, ip, w, wcfg=wcfg, steps=300, desired_vel=5.0, path="f32"
        )

    run = PM.sharded_rollout(rollout_fn, mesh)
    res = run(
        PM.replicate(mesh, params), None, PM.shard_batch(mesh, worlds)
    )
    assert res.success.shape == (8,)
    assert bool(jnp.all(res.success))
    # Matches the unsharded rollout exactly (same worlds, same policy).
    res_ref = jax.jit(rollout_fn)(params, None, worlds)
    np.testing.assert_allclose(
        np.asarray(res.final_x), np.asarray(res_ref.final_x), atol=1e-5
    )
