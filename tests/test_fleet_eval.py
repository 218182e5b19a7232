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
