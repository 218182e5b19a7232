"""DAgger collection: on-policy states, expert labels, Trainer-ready."""

import jax
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core.config import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig
from drone_oa_iree_vit_accelerator_tpu.train import dagger as DG
from drone_oa_iree_vit_accelerator_tpu.train.dataset import pad_batch

WCFG = WorldConfig(n_obstacles=4, goal_x=10.0)


def test_expert_collection_shapes_and_labels():
    trajs = DG.collect_expert_trajectories(
        CFG, 3, wcfg=WCFG, steps=400, frame_stride=5, seed=3
    )
    assert len(trajs) >= 1
    for t in trajs:
        n = t.frames.shape[0]
        assert n % 40 == 0 and n <= 80
        assert t.frames.shape == (n, 1, 60, 90) and t.frames.dtype == np.uint8
        assert t.cmd_gt.shape == (n, 3)
        # expert labels are bounded by desired velocity
        assert np.all(np.linalg.norm(t.cmd_gt, axis=-1) <= 5.0 + 1e-4)
        # forward motion dominates for the expert
        assert t.cmd_gt[:, 0].mean() > 1.0


def test_sanitized_labels_are_observability_consistent():
    """sanitize_labels: threat-free frames get the canonical cruise
    label [desired_vel, 0, 0]; threat-visible frames keep the expert's
    dodge label (train/dagger.py _collect_batch)."""
    params = M.init_params(CFG, jax.random.PRNGKey(1))
    trajs = DG.collect_policy_trajectories(
        CFG, params, 4, wcfg=WCFG, steps=400, frame_stride=5, seed=7,
        expert_mix=0.5, sanitize_labels=True, desired_vel=5.0,
    )
    if not trajs:
        return
    thresh = (1.0 - 10.0 / WCFG.max_depth) * 255.0
    seen_free = False
    for t in trajs:
        vis = t.frames.reshape(t.frames.shape[0], -1).max(axis=1) > thresh
        free = ~vis
        if free.any():
            seen_free = True
            np.testing.assert_allclose(
                t.cmd_gt[free],
                np.tile([5.0, 0.0, 0.0], (int(free.sum()), 1)),
                atol=1e-6,
            )
    assert seen_free  # the probe only means something if it fired


def test_max_drift_truncation_bounds_trajectories():
    """max_drift_m truncates a trajectory at the first off-corridor
    frame (round-3 collapse attribution: whole drift flights poison
    LSTM training). Same seed with/without the bound: bounded output is
    a prefix of the unbounded output, and total frames shrink when a
    random policy (which drifts fast) collects."""
    params = M.init_params(CFG, jax.random.PRNGKey(2))
    kw = dict(wcfg=WCFG, steps=400, frame_stride=5, seed=11,
              expert_mix=0.0)
    free = DG.collect_policy_trajectories(CFG, params, 6, **kw)
    tight = DG.collect_policy_trajectories(
        CFG, params, 6, max_drift_m=0.5, **kw
    )
    if not free:
        return
    n_free = sum(t.frames.shape[0] for t in free)
    n_tight = sum(t.frames.shape[0] for t in tight)
    assert n_tight <= n_free
    # every bounded trajectory is a frame-prefix of some unbounded one
    free_by_head = {t.frames[:40].tobytes(): t for t in free}
    for t in tight:
        src = free_by_head.get(t.frames[:40].tobytes())
        assert src is not None
        n = t.frames.shape[0]
        assert np.array_equal(t.frames, src.frames[:n])


def test_policy_collection_feeds_trainer_batches():
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    trajs = DG.collect_policy_trajectories(
        CFG, params, 4, wcfg=WCFG, steps=400, frame_stride=5, seed=4,
        expert_mix=0.5,
    )
    if not trajs:  # random policy may crash instantly in a dense world
        return
    batch = pad_batch(trajs)
    assert batch.frames.shape[0] == len(trajs)
    assert batch.mask.max() == 1.0
    # labels come from the expert, not the (random) policy: finite, bounded
    assert np.all(np.isfinite(batch.cmd_gt))
