"""Trajectory dataset: reference on-disk layout + synthetic generation.

On-disk layout (reference samples/inference_trainingset_comparison/
main.cpp:85-122, 206-239, provided upstream by the vitfly dataset):

    root/
      <trajectory>/
        data.csv            # row: idx, ts, vel_des, qw, qx, qy, qz,
                            #      ..., vel_x, vel_y, vel_z  (cols 10-12)
        <timestamp>.png     # one grayscale depth frame per row

Frames resize to 60x90 and normalize /255 downstream; telemetry joins by
timestamp (eps 1e-3).

``generate_synthetic`` writes that same layout from our sim with a
scripted potential-field expert — standing in for the unavailable vitfly
Flightmare data so the full train -> QAT -> int8 -> parity chain is
exercisable end to end (SURVEY.md section 7 hard-part 5).
"""

from __future__ import annotations

import csv
import pathlib
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline.wire import IMAGE_SHAPE
from ..sim import world as W


class Trajectory(NamedTuple):
    frames: np.ndarray  # (T, 1, 60, 90) u8
    vel_des: np.ndarray  # (T, 1) f32
    quat: np.ndarray  # (T, 4) f32
    cmd_gt: np.ndarray  # (T, 3) f32 ground-truth velocity command


class Batch(NamedTuple):
    """Stacked, padded trajectories with a validity mask."""

    frames: np.ndarray  # (B, T, 1, 60, 90) u8
    vel_des: np.ndarray  # (B, T, 1)
    quat: np.ndarray  # (B, T, 4)
    cmd_gt: np.ndarray  # (B, T, 3)
    mask: np.ndarray  # (B, T) f32


def _load_png_gray(path: pathlib.Path) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("L")
    if img.size != (IMAGE_SHAPE[1], IMAGE_SHAPE[0]):  # PIL size is (W, H)
        img = img.resize((IMAGE_SHAPE[1], IMAGE_SHAPE[0]), Image.BILINEAR)
    return np.asarray(img, np.uint8)


_JOIN_EPS = 0.001  # reference main.cpp:209 "const double epsilon = 0.001"


def load_trajectory(traj_dir: str | pathlib.Path) -> Trajectory:
    """Load one trajectory folder by the reference C++ parser's exact
    rules (samples/inference_trainingset_comparison/main.cpp:206-239):

    - rows with <= 12 columns are skipped (ragged-row tolerance);
    - ONLY the consumed columns are parsed — ts (1), vel_des (2),
      quat wxyz (3-6), ground-truth velocity (10-12); junk in unused
      columns (7-9) does not invalidate a row;
    - a row whose consumed cells fail to parse is skipped silently;
    - each frame joins the FIRST row (file order) whose timestamp is
      within |csv_ts - img_ts| < 0.001 — an epsilon window, not string
      or rounded equality.
    """
    traj_dir = pathlib.Path(traj_dir)
    ts_list: list[float] = []
    row_list: list[list[float]] = []
    with open(traj_dir / "data.csv") as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            if len(row) > 12:  # main.cpp:218 "row.size() > 12"
                try:
                    ts_list.append(float(row[1]))
                    row_list.append(
                        [float(row[i]) for i in (2, 3, 4, 5, 6, 10, 11, 12)]
                    )
                except ValueError:
                    if len(ts_list) > len(row_list):
                        ts_list.pop()
                    continue
    csv_ts = np.asarray(ts_list, np.float64)

    def _ts(png: pathlib.Path) -> float | None:
        try:
            return float(png.stem)
        except ValueError:
            return None

    # Numeric sort: lexical order breaks at ts >= 10 ("10.0" < "2.0").
    pngs = sorted(
        (p for p in traj_dir.glob("*.png") if _ts(p) is not None), key=_ts
    )
    frames, vel_des, quat, cmd = [], [], [], []
    for png in pngs:
        ts = float(png.stem)
        if csv_ts.size == 0:
            continue
        within = np.abs(csv_ts - ts) < _JOIN_EPS
        if not within.any():
            continue
        # FIRST row in file order inside the window (the C++ scans the
        # file top-down and returns on the first hit — not the nearest).
        r = row_list[int(np.argmax(within))]
        frames.append(_load_png_gray(png)[None])
        vel_des.append([r[0]])
        quat.append(r[1:5])
        cmd.append(r[5:8])
    if not frames:
        raise ValueError(f"no matched frames in {traj_dir}")
    return Trajectory(
        frames=np.stack(frames).astype(np.uint8),
        vel_des=np.asarray(vel_des, np.float32),
        quat=np.asarray(quat, np.float32),
        cmd_gt=np.asarray(cmd, np.float32),
    )


def load_dataset(root: str | pathlib.Path) -> list[Trajectory]:
    root = pathlib.Path(root)
    trajs = []
    for d in sorted(p for p in root.iterdir() if p.is_dir()):
        if (d / "data.csv").exists():
            trajs.append(load_trajectory(d))
    if not trajs:
        raise ValueError(f"no trajectories under {root}")
    return trajs


def pad_batch(trajs: list[Trajectory]) -> Batch:
    t_max = max(t.frames.shape[0] for t in trajs)

    def pad(x, fill=0):
        out = np.full((t_max, *x.shape[1:]), fill, x.dtype)
        out[: x.shape[0]] = x
        return out

    return Batch(
        frames=np.stack([pad(t.frames) for t in trajs]),
        vel_des=np.stack([pad(t.vel_des) for t in trajs]),
        quat=np.stack([pad(t.quat) for t in trajs]),
        cmd_gt=np.stack([pad(t.cmd_gt) for t in trajs]),
        mask=np.stack(
            [
                np.concatenate(
                    [
                        np.ones(t.frames.shape[0], np.float32),
                        np.zeros(t_max - t.frames.shape[0], np.float32),
                    ]
                )
                for t in trajs
            ]
        ),
    )


def batches(
    trajs: list[Trajectory], batch_size: int, seed: int = 0, shuffle: bool = True
) -> Iterator[Batch]:
    order = np.arange(len(trajs))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for i in range(0, len(order), batch_size):
        yield pad_batch([trajs[j] for j in order[i : i + batch_size]])


# ---------------------------------------------------------------------------
# Synthetic data from the sim + a scripted expert
# ---------------------------------------------------------------------------


def expert_command(
    world: W.World,
    pos: jax.Array,
    desired_vel: float,
    wcfg: W.WorldConfig,
    margin: float = 1.2,
    horizon: float = 10.0,
) -> jax.Array:
    """Most-imminent-obstacle dodge expert — the teacher the policy clones.

    Look along +x; among obstacles whose lateral (y,z) clearance is below
    ``margin`` within ``horizon`` meters ahead, dodge perpendicular away
    from the nearest one, scaled by urgency and the clearance deficit.
    (0/16 collisions, 16/16 goals on held-out eval worlds — a potential-
    field variant trapped between obstacle pairs and clipped 25%.)
    """
    rel = world.centers - pos  # (n, 3)
    lat = jnp.linalg.norm(rel[:, 1:], axis=-1)
    clearance = lat - (world.radii + margin)
    threat = (rel[:, 0] > -0.5) & (rel[:, 0] < horizon) & (clearance < 0.0)
    score = jnp.where(threat, rel[:, 0], jnp.inf)
    i = jnp.argmin(score)
    any_threat = jnp.isfinite(score[i])
    d_lat = -rel[i, 1:]
    dodge = d_lat / (jnp.linalg.norm(d_lat) + 1e-6)
    urgency = jnp.clip(1.0 - rel[i, 0] / horizon, 0.3, 1.0)
    deficit = -clearance[i]
    v_lat = jnp.where(
        any_threat, dodge * urgency * (2.0 + 2.0 * deficit), jnp.zeros(2)
    )
    alt = 0.6 * (wcfg.spawn_z - pos[2])  # altitude keeping
    v = jnp.asarray([desired_vel, v_lat[0], v_lat[1] + alt])
    speed = jnp.linalg.norm(v)
    return jnp.where(speed > desired_vel, v * desired_vel / speed, v)


def generate_synthetic(
    root: str | pathlib.Path,
    n_trajectories: int = 8,
    steps: int = 150,
    desired_vel: float = 5.0,
    frame_stride: int = 5,
    seed: int = 0,
    wcfg: W.WorldConfig = W.WorldConfig(),
    noise_std: float = 0.0,
) -> pathlib.Path:
    """Write a reference-layout dataset by rolling the expert through
    random worlds (camera at ``frame_stride`` x dt period, ~20 Hz).

    ``noise_std`` > 0 injects Gaussian velocity noise into the EXECUTED
    command while keeping the clean expert command as the label
    (noisy-expert / DART-style recovery demonstrations — behavior cloning
    otherwise collapses off-distribution; see
    docs/HOW-TO-train-and-quantize.md checkpoint-selection note).
    """
    from PIL import Image

    root = pathlib.Path(root)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(world_centers, world_radii, noise_key):
        world = W.World(world_centers, world_radii)

        def tick(carry, t):
            state, nk = carry
            img = W.render_depth(world, state.pos, wcfg)
            cmd = expert_command(world, state.pos, desired_vel, wcfg)
            nk, sub = jax.random.split(nk)
            executed = cmd + noise_std * jax.random.normal(sub, (3,))
            new = W.step_dynamics(state, executed, wcfg)
            return (new, nk), (img, cmd, state.pos)

        state0 = W.init_drone(wcfg)
        _, (imgs, cmds, poss) = jax.lax.scan(
            tick, (state0, noise_key), jnp.arange(steps * frame_stride)
        )
        return imgs[::frame_stride], cmds[::frame_stride], poss[::frame_stride]

    for ti in range(n_trajectories):
        world = W.sample_world(jax.random.fold_in(key, ti), wcfg)
        imgs, cmds, poss = jax.tree_util.tree_map(
            np.asarray,
            run(world.centers, world.radii, jax.random.fold_in(key, 10_000 + ti)),
        )
        tdir = root / f"trajectory_{ti:04d}"
        tdir.mkdir(parents=True, exist_ok=True)
        with open(tdir / "data.csv", "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(
                ["idx", "ts", "vel_des", "quat_1", "quat_2", "quat_3",
                 "quat_4", "pos_x", "pos_y", "pos_z", "vel_x", "vel_y",
                 "vel_z"]
            )
            for i in range(steps):
                ts = round((i + 1) * wcfg.dt * frame_stride, 3)
                Image.fromarray(imgs[i, :, :]).save(tdir / f"{ts:.3f}.png")
                wr.writerow(
                    [i, f"{ts:.3f}", desired_vel, 1.0, 0.0, 0.0, 0.0,
                     *np.round(poss[i], 5), *np.round(cmds[i], 5)]
                )
    return root
