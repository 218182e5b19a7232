"""Dataset-replay comparator — offline eval over trajectory folders.

Mirrors the reference's replay tools (samples/inference_trainingset_
comparison/main.cpp: walk trajectory dirs, run the model frame by frame
with per-trajectory LSTM state reset, print predicted vs ground-truth
velocity and the L2 error) — but batched: every trajectory replays in
parallel under vmap + lax.scan as one jitted program.

    python -m drone_oa_iree_vit_accelerator_tpu.tools.replay_eval \
        --dataset data/ [--params ckpt.npz] [--path f32|int8|pallas]
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import MODEL_ZOO, ModelConfig
from ..models import vit_lstm as M
from .. import quant as QZ
from ..train import dataset as D


def replay_batch(
    cfg: ModelConfig,
    params: dict,
    int_params: dict | None,
    batch: dict,
    path: str = "f32",
):
    """(B, T, ...) padded batch -> per-frame commands (B, T, 3)."""
    b = batch["frames"].shape[0]
    state0 = M.zero_state(cfg, b)

    def tick(state, xs):
        frames, vel, quat, mask = xs
        f = frames.astype(jnp.float32) / 255.0
        if path == "pallas":
            interp = jax.default_backend() != "tpu"
            cmd, state_new = QZ.pallas_forward(
                cfg, params, int_params, f, vel, quat, state, interpret=interp
            )
        elif path == "int8":
            cmd, state_new = QZ.int8_forward(
                cfg, params, int_params, f, vel, quat, state
            )
        else:
            cmd, state_new = M.forward(cfg, params, f, vel, quat, state)
        state_new = jax.tree_util.tree_map(
            lambda new, old: jnp.where(mask[None, :, None] > 0, new, old),
            state_new, state,
        )
        return state_new, cmd

    xs = (
        jnp.moveaxis(batch["frames"], 0, 1),
        jnp.moveaxis(batch["vel_des"], 0, 1),
        jnp.moveaxis(batch["quat"], 0, 1),
        jnp.moveaxis(batch["mask"], 0, 1),
    )
    _, cmds = jax.lax.scan(tick, state0, xs)
    return jnp.moveaxis(cmds, 0, 1)  # (B, T, 3)


def evaluate_replay(
    dataset_dir: str,
    cfg: ModelConfig,
    params: dict,
    int_params: dict | None = None,
    path: str = "f32",
    verbose: bool = False,
) -> dict:
    trajs = D.load_dataset(dataset_dir)
    batch = D.pad_batch(trajs)
    dev = {k: jnp.asarray(v) for k, v in batch._asdict().items()}
    run = jax.jit(lambda p, ip, b: replay_batch(cfg, p, ip, b, path))
    cmds = np.asarray(run(params, int_params, dev))

    gt = batch.cmd_gt
    mask = batch.mask
    err = np.linalg.norm(cmds - gt, axis=-1) * mask  # (B, T)
    per_traj = []
    for i in range(len(trajs)):
        n = int(mask[i].sum())
        per_traj.append(
            {
                "trajectory": i,
                "frames": n,
                "mean_l2_error": float(err[i].sum() / max(n, 1)),
                "max_l2_error": float(err[i].max()),
            }
        )
        if verbose:
            for t in range(n):
                print(
                    f"traj {i} frame {t}: pred={np.round(cmds[i, t], 3)} "
                    f"gt={np.round(gt[i, t], 3)} err={err[i, t]:.4f}"
                )
    total = float(err.sum() / max(mask.sum(), 1))
    return {
        "path": path,
        "trajectories": len(trajs),
        "mean_l2_error": total,
        "per_trajectory": per_traj,
    }


def main() -> None:
    import argparse

    from ..models import params_io
    from ..pipeline.serve import _calibrate_random

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--params", default=None)
    ap.add_argument("--int-params", default=None)
    ap.add_argument("--model", default="ITA_single_layer_upsample_shuffle")
    ap.add_argument("--path", default="f32", choices=["f32", "int8", "pallas"])
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    cfg = MODEL_ZOO[args.model]
    params = M.init_params(cfg, jax.random.PRNGKey(0))
    if args.params:
        params = params_io.load_params(args.params, params)
    int_params = None
    if args.path in ("int8", "pallas"):
        like = _calibrate_random(cfg, params)
        int_params = (
            params_io.load_params(args.int_params, like)
            if args.int_params
            else like
        )
    result = evaluate_replay(
        args.dataset, cfg, params, int_params, args.path, args.verbose
    )
    print(json.dumps({k: v for k, v in result.items() if k != "per_trajectory"}))
    for row in result["per_trajectory"]:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
