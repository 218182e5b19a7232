"""Closed-loop UDP fleet evaluation smoke (CPU, interpret mode).

The full parity run against the in-jit rollout happens on the TPU
(scripts/fleet_eval.py -> docs/fleet_eval.json); here the loop is
exercised end-to-end on tiny worlds: N drones, ephemeral-port server,
host-side dynamics mirroring rollout_batch's tick."""

import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import FleetEngine
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import sample_worlds
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig
from drone_oa_iree_vit_accelerator_tpu.tools.fleet_eval import (
    fleet_closed_loop_eval,
)

import jax


def test_fleet_udp_mesh_matches_single_device():
    """The last untested combination of (wire transport x mesh sharding)
    — VERDICT r3 item 8: the UDP closed loop driven through a FleetEngine
    sharded over the 8-device virtual mesh produces the SAME per-world
    outcomes as the single-device fleet server. Per-drone serving is
    embarrassingly parallel DP (zero cross-chip traffic per tick), so
    only the float-glue summation shapes differ; on a short horizon the
    outcomes and trajectories must agree."""
    import pytest

    from drone_oa_iree_vit_accelerator_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    wcfg = WorldConfig(n_obstacles=2, goal_x=2.0)
    worlds = sample_worlds(jax.random.PRNGKey(5), 4, wcfg)
    kw = dict(wcfg=wcfg, steps=8, desired_vel=3.0, native=True)

    eng_one = FleetEngine(CFG, capacity=8, idle_reset_s=3600.0)
    ref = fleet_closed_loop_eval(eng_one, worlds, **kw)

    mesh = make_mesh(8)
    eng_mesh = FleetEngine(CFG, capacity=8, idle_reset_s=3600.0, mesh=mesh)
    res = fleet_closed_loop_eval(eng_mesh, worlds, **kw)

    assert res["success"].tolist() == ref["success"].tolist()
    assert res["collided"].tolist() == ref["collided"].tolist()
    np.testing.assert_allclose(res["final_x"], ref["final_x"],
                               rtol=1e-4, atol=1e-4)
    assert eng_mesh.frames == eng_one.frames == 4 * 8


def test_fleet_closed_loop_smoke():
    wcfg = WorldConfig(n_obstacles=2, goal_x=2.0)
    worlds = sample_worlds(jax.random.PRNGKey(3), 3, wcfg)
    engine = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    res = fleet_closed_loop_eval(
        engine, worlds, wcfg=wcfg, steps=8, desired_vel=3.0, native=True,
    )
    assert res["success"].shape == (3,)
    assert res["final_x"].shape == (3,)
    # 8 ticks of motion from a standing start: drones moved forward but
    # cannot have reached the 2 m goal yet.
    assert np.all(res["final_x"] > 0.0)
    assert np.all(np.isfinite(res["final_x"]))
    # The engine served one frame per active drone per tick.
    assert engine.frames == 3 * 8
