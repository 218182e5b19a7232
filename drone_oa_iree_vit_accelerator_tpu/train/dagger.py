"""DAgger: on-policy data aggregation against the scripted expert.

Round-1 behavior cloning on expert-only rollouts reached 87.5% on the
16-world eval but only 48% on 64 held-out worlds — the classic BC
covariate-shift failure (the policy visits states the expert never
demonstrated, then compounds its own errors). Noisy-expert (DART-style)
data made it WORSE (measured: 36-50%). The standard remedy is DAgger
(Ross et al., AISTATS 2011): roll out the CURRENT policy, query the
expert for the correct command at every visited state, aggregate, and
retrain. The reference's lifecycle has no analog (its vitfly dataset is
fixed), so this is a framework addition on the training side (the closed
loop it needs is SURVEY.md section 3.6's evaluation loop, which we have
as a batched jit).

Everything here is one jitted lax.scan per collection batch: render ->
policy -> postprocess -> dynamics, recording (frame, expert label) every
``frame_stride`` ticks while the drone is still active.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..models import vit_lstm as M
from ..pipeline.serve import postprocess_velocity
from ..sim import world as W
from ..sim.rollout import sample_worlds
from .dataset import Trajectory, expert_command


def _family_fns(cfg):
    """Forward/init dispatch: the collector serves both model families
    (ModelConfig -> models/vit_lstm, VitflyConfig -> models/vitfly, the
    upstream alt family — same (cfg, params, frames, vel, quat, state)
    signature, shared zero_state)."""
    from ..models.vitfly import VitflyConfig

    if isinstance(cfg, VitflyConfig):
        from ..models import vitfly as VF

        return VF.forward, VF.init_params
    return M.forward, M.init_params


class _Collected(NamedTuple):
    frames: jax.Array  # (T, B, 60, 90) u8
    labels: jax.Array  # (T, B, 3) expert commands at the visited states
    active: jax.Array  # (T, B) bool — state was live when visited
    drift: jax.Array   # (T, B) lateral corridor drift |(y, z-spawn_z)| m
    drift_z: jax.Array  # (T, B) altitude drift |z - spawn_z| m


def _collect_batch(
    cfg: ModelConfig,
    params: dict,
    worlds: W.World,  # stacked (B, ...)
    wcfg: W.WorldConfig,
    steps: int,
    frame_stride: int,
    desired_vel: float,
    expert_mix: float,
    sanitize_labels: bool,
    key: jax.Array,
) -> _Collected:
    """Roll B drones under the current policy; label states with the expert.

    ``expert_mix``: probability per-drone-per-segment of executing the
    EXPERT action instead of the policy's (DAgger's beta; 0 = pure
    on-policy). Labels are always the expert's.

    ``sanitize_labels``: observability-consistent relabeling. The
    scripted expert's command is a function of world STATE — including
    components a depth frame cannot show (its altitude-keeping term
    corrects z-drift; its x slows while it corrects). On a drifted
    policy's visited states this yields huge state-dependent labels on
    visually threat-free frames (measured: |z| label mean 2.40 vs 0.25,
    83% of frames with |lat|>1 — seed 1 round 1). With this flag,
    frames with no threat visible within the expert's 10 m dodge
    horizon get the canonical cruise label [desired_vel, 0, 0];
    threat-visible frames keep the expert's dodge label. Data-hygiene
    option: it provably removes the unfittable label component, but the
    measured seeds-1/2 collapse is NOT rescued by it — the probe matrix
    (checkpoints/policy_report.json collapse probes;
    scripts/collapse_control_probe.py) shows the poison rides the
    policy-visited FRAMES and survives every label intervention.
    """
    b = worlds.radii.shape[0]
    drone0 = jax.vmap(lambda _: W.init_drone(wcfg))(jnp.arange(b))
    lstm0 = M.zero_state(cfg, b)
    vel_des = jnp.full((b,), desired_vel)
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)

    n_rec = steps // frame_stride

    def segment(carry, t):
        drone, lstm, done, k = carry
        images = jax.vmap(lambda w, p: W.render_depth(W.World(*w), p, wcfg))(
            (worlds.centers, worlds.radii), drone.pos
        )  # (B, 60, 90) u8
        exp_cmd = jax.vmap(
            lambda w, p: expert_command(W.World(*w), p, desired_vel, wcfg)
        )((worlds.centers, worlds.radii), drone.pos)

        frames = images.astype(jnp.float32)[:, None] / 255.0
        cmd_raw, lstm_new = _family_fns(cfg)[0](
            cfg, params, frames, vel_des[:, None], quat, lstm
        )
        pol_cmd = jax.vmap(postprocess_velocity)(
            cmd_raw, vel_des, drone.pos[:, 0]
        )
        k, sub = jax.random.split(k)
        use_expert = jax.random.uniform(sub, (b,)) < expert_mix
        cmd = jnp.where(use_expert[:, None], exp_cmd, pol_cmd)

        active = ~done
        cmd = jnp.where(active[:, None], cmd, 0.0)

        # Hold the command for frame_stride dynamics ticks (camera rate).
        def dyn(s, _):
            return (
                jax.vmap(lambda ss, cc: W.step_dynamics(ss, cc, wcfg))(s, cmd),
                None,
            )

        drone_new, _ = jax.lax.scan(dyn, drone, None, length=frame_stride)
        drone_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[:, None], new, old),
            drone_new, drone,
        )
        lstm_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active[None, :, None], new, old),
            lstm_new, lstm,
        )
        hit = jax.vmap(lambda w, p: W.check_collision(W.World(*w), p, wcfg))(
            (worlds.centers, worlds.radii), drone_new.pos
        )
        reached = drone_new.pos[:, 0] >= wcfg.goal_x
        done_new = done | (hit & active) | reached
        if sanitize_labels:
            # Threat visible within the expert's 10 m dodge horizon?
            # (inverse-depth u8: brightness (1 - d/max_depth)*255)
            horizon_px = (1.0 - 10.0 / wcfg.max_depth) * 255.0
            vis = images.reshape(b, -1).max(axis=1) > horizon_px
            cruise = jnp.zeros_like(exp_cmd).at[:, 0].set(desired_vel)
            label = jnp.where(vis[:, None], exp_cmd, cruise)
        else:
            label = exp_cmd
        drift_z = jnp.abs(drone.pos[:, 2] - wcfg.spawn_z)
        drift = jnp.sqrt(drone.pos[:, 1] ** 2 + drift_z ** 2)
        return (
            (drone_new, lstm_new, done_new, k),
            (images, label, active, drift, drift_z),
        )

    (_, _, _, _), (frames, labels, active, drift, drift_z) = jax.lax.scan(
        segment,
        (drone0, lstm0, jnp.zeros((b,), bool), key),
        jnp.arange(n_rec),
    )
    return _Collected(frames=frames, labels=labels, active=active,
                      drift=drift, drift_z=drift_z)


def collect_policy_trajectories(
    cfg: ModelConfig,
    params: dict,
    n_trajectories: int,
    *,
    wcfg: W.WorldConfig = W.WorldConfig(),
    steps: int = 1200,
    frame_stride: int = 5,
    desired_vel: float = 5.0,
    expert_mix: float = 0.0,
    sanitize_labels: bool = False,
    max_drift_m: float | None = None,
    max_z_drift_m: float | None = None,
    seed: int = 0,
    min_frames: int = 8,
) -> list[Trajectory]:
    """DAgger collection: policy-visited states with expert labels.

    Returns reference-layout Trajectory tuples (frames u8, vel_des, quat,
    expert cmd) trimmed to each drone's active prefix — drop-in for
    Trainer(trajectories=...). ``sanitize_labels``: see _collect_batch.

    ``max_drift_m``: truncate each trajectory at the first frame whose
    lateral corridor drift |(y, z - spawn_z)| exceeds this bound. The
    round-3 collapse attribution (checkpoints/policy_report.json
    label_intervention_probes) found that whole altitude-drift flights
    poison LSTM training regardless of their labels — drift is visible
    to the collector's sim state even though the policy's depth camera
    cannot see it, so bounding it here removes the poison carrier at
    the source. None (default) keeps the full active prefix.

    ``max_z_drift_m``: same truncation on |z - spawn_z| ALONE. The
    round-4 drift probe (scripts/drift_probe.py) measured the axes
    separately: the expert's altitude drift never exceeds 2.3 m while
    the collapsing seeds' round-0 policies blow up to ~11 m in z — but
    a HEALTHY policy legitimately wanders >20 m in y while correcting
    (seed 0), so the combined bound cannot separate poison from useful
    off-corridor DAgger states. Bounding z alone does, cleanly.
    """
    key = jax.random.PRNGKey(seed)
    worlds = sample_worlds(jax.random.fold_in(key, 1), n_trajectories, wcfg)
    run = jax.jit(
        lambda p, w: _collect_batch(
            cfg, p, w, wcfg, steps, frame_stride, desired_vel,
            expert_mix, sanitize_labels, jax.random.fold_in(key, 2),
        )
    )
    col = jax.block_until_ready(run(params, worlds))
    frames = np.asarray(col.frames)  # (T, B, 60, 90)
    labels = np.asarray(col.labels)
    active = np.asarray(col.active)
    drift = np.asarray(col.drift)
    drift_z = np.asarray(col.drift_z)

    out: list[Trajectory] = []
    for i in range(n_trajectories):
        n = int(active[:, i].sum())
        if max_drift_m is not None:
            over = np.nonzero(drift[:n, i] > max_drift_m)[0]
            if over.size:
                n = int(over[0])
        if max_z_drift_m is not None:
            over = np.nonzero(drift_z[:n, i] > max_z_drift_m)[0]
            if over.size:
                n = int(over[0])
        # Trim to a multiple of 40 frames: pad_batch pads each batch to
        # its max length, and a fresh (B, T) shape means a fresh XLA
        # compile — quantizing lengths keeps the compile set small.
        n = (n // 40) * 40
        if n < max(min_frames, 40):
            continue
        t = frames[:n, i][:, None, :, :]  # (n, 1, 60, 90)
        out.append(
            Trajectory(
                frames=t.astype(np.uint8),
                vel_des=np.full((n, 1), desired_vel, np.float32),
                quat=np.tile(
                    np.asarray([[1.0, 0, 0, 0]], np.float32), (n, 1)
                ),
                cmd_gt=labels[:n, i].astype(np.float32),
            )
        )
    return out


def chunk_trajectories(
    trajectories: list[Trajectory], max_frames: int
) -> list[Trajectory]:
    """Split trajectories into <=max_frames snippets (LSTM re-zeroed per
    snippet by the trainer's per-trajectory state reset).

    Secondary collapse mitigation: the round-3 closing probe measured
    that chunking poison flights into 40-frame snippets restores partial
    trainability (0.359 vs 0.0 — checkpoints/policy_report.json
    label_intervention_probes.chunked_onpolicy), i.e. the poison lives
    in long-range temporal structure the LSTM absorbs. max_frames should
    stay a multiple of 40 (the pad_batch length quantum)."""
    out: list[Trajectory] = []
    for t in trajectories:
        n = t.frames.shape[0]
        for s in range(0, n, max_frames):
            e = min(s + max_frames, n)
            if e - s < 40:
                break
            out.append(Trajectory(*[f[s:e] for f in t]))
    return out


def collect_expert_trajectories(
    cfg: ModelConfig,
    n_trajectories: int,
    *,
    wcfg: W.WorldConfig = W.WorldConfig(),
    steps: int = 1200,
    frame_stride: int = 5,
    desired_vel: float = 5.0,
    seed: int = 0,
) -> list[Trajectory]:
    """Expert-only rollouts (DAgger round 0), in memory — the same data
    train.dataset.generate_synthetic writes to disk, without the PNG
    round-trip."""
    params = _family_fns(cfg)[1](cfg, jax.random.PRNGKey(0))  # unused at mix=1
    return collect_policy_trajectories(
        cfg, params, n_trajectories, wcfg=wcfg, steps=steps,
        frame_stride=frame_stride, desired_vel=desired_vel,
        expert_mix=1.0, seed=seed,
    )
