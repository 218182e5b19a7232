"""Rollout evaluation: metrics aggregation + evaluation.yaml output.

Mirrors the reference's evaluation flow (launch_evaluation_FPGA.bash:
61-62,157-158 concatenates per-rollout summary.yaml files into
evaluation.yaml; vitfly's evaluation_node.py computes the per-rollout
summary) — but the rollouts are batched on-device instead of sequential
ROS sessions, so a full N-rollout evaluation is one jit + one aggregation.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np

from ..core.config import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE, ModelConfig
from ..models import vit_lstm as M
from .rollout import RolloutResult, rollout_batch, sample_worlds
from .world import WorldConfig


def summarize(result: RolloutResult, desired_vel: float) -> dict[str, Any]:
    """Aggregate batched rollout results into an evaluation summary.

    Keys follow the spirit of vitfly's summary.yaml (success / collision
    counts, timings); exact schema documented here since the submodule is
    not vendored.
    """
    success = np.asarray(result.success)
    collided = np.asarray(result.collided)
    ttg = np.asarray(result.time_to_goal)
    n = success.shape[0]
    finished = np.isfinite(ttg)
    per_rollout = [
        {
            "rollout": i,
            "success": bool(success[i]),
            "collision": bool(collided[i]),
            "time_to_goal": float(ttg[i]) if finished[i] else None,
            "mean_speed": float(np.asarray(result.mean_speed)[i]),
            "final_x": float(np.asarray(result.final_x)[i]),
        }
        for i in range(n)
    ]
    return {
        "desired_velocity": desired_vel,
        "rollouts": n,
        "successes": int(success.sum()),
        "collisions": int(collided.sum()),
        "success_rate": float(success.mean()),
        "collision_rate": float(collided.mean()),
        "mean_time_to_goal": float(ttg[finished].mean()) if finished.any() else None,
        "per_rollout": per_rollout,
    }


def to_yaml(summary: dict[str, Any]) -> str:
    """Minimal YAML emitter (no external deps) for evaluation.yaml."""

    def emit(obj, indent=0):
        pad = "  " * indent
        lines = []
        if isinstance(obj, dict):
            for k, v in obj.items():
                if isinstance(v, (dict, list)):
                    lines.append(f"{pad}{k}:")
                    lines.extend(emit(v, indent + 1))
                else:
                    lines.append(f"{pad}{k}: {json.dumps(v)}")
        elif isinstance(obj, list):
            for item in obj:
                if isinstance(item, dict):
                    first, *rest = emit(item, indent + 1)
                    lines.append(f"{pad}- {first.strip()}")
                    lines.extend(rest)
                else:
                    lines.append(f"{pad}- {json.dumps(item)}")
        return lines

    return "\n".join(emit(summary)) + "\n"


def evaluate(
    n_rollouts: int = 8,
    desired_vel: float = 5.0,
    steps: int = 1500,
    seed: int = 0,
    path: str = "f32",
    cfg: ModelConfig = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
    params: dict | None = None,
    int_params: dict | None = None,
    wcfg: WorldConfig = WorldConfig(),
    out_yaml: str | None = None,
    softmax_mode: str = "onepass",
) -> dict[str, Any]:
    """Run N parallel closed-loop rollouts and aggregate.

    ``softmax_mode='streaming'`` evaluates the hardware's ITA_N=16
    partial softmax (PyITA's verification default) on the quantized
    paths; 'onepass' is the single-pass integer softmax."""
    key = jax.random.PRNGKey(seed)
    if params is None and path != "expert":
        params = M.init_params(cfg, key)
    if int_params is None and path in ("int8", "pallas", "turbo", "mega"):
        from ..pipeline.serve import _calibrate_random

        int_params = _calibrate_random(cfg, params)
    if path == "turbo" and not (
        isinstance(int_params, tuple) and len(int_params) == 2
    ):
        from ..quant.batched import make_tail

        int_params = (int_params, make_tail(cfg, params, e_major=True))
    if path == "mega" and not hasattr(params, "tok"):
        # The megakernel consumes its packed operand pytree, exactly as
        # the serving engine deploys it (pipeline/serve.py path='mega').
        from ..ops.pallas.model_kernel import make_flagship_kernel_params

        params = make_flagship_kernel_params(cfg, params, int_params)

    worlds = sample_worlds(jax.random.fold_in(key, 1), n_rollouts, wcfg)
    run = jax.jit(
        lambda p, ip, w: rollout_batch(
            cfg, p, ip, w, wcfg=wcfg, steps=steps,
            desired_vel=desired_vel, path=path, softmax_mode=softmax_mode,
        )
    )
    result = jax.block_until_ready(run(params, int_params, worlds))
    summary = summarize(result, desired_vel)
    if out_yaml:
        with open(out_yaml, "w") as f:
            f.write(to_yaml(summary))
    return summary


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rollouts", type=int, default=8)
    ap.add_argument("--vel", type=float, default=5.0)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--path", default="f32",
        choices=["f32", "int8", "pallas", "turbo", "mega", "expert"],
    )
    ap.add_argument("--out", default="evaluation.yaml")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--softmax-mode", default="onepass",
                    choices=["onepass", "streaming"])
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    s = evaluate(
        args.rollouts, args.vel, args.steps, args.seed, args.path,
        out_yaml=args.out, softmax_mode=args.softmax_mode,
    )
    print(json.dumps({k: v for k, v in s.items() if k != "per_rollout"}))
