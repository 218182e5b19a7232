"""Control probe for the seeds-1/2 DAgger collapse attribution.

The retrain-scratch probe (checkpoints/policy_report.json
``retrain_scratch_probe``) showed: seed 1's round-0 recipe reaches
0.938 closed-loop on 96 expert trajectories, but 0.0 at EVERY epoch
once its 48 relabeled on-policy trajectories join the aggregate. That
supports "the on-policy data is poisonous" — but has a confound: maybe
ANY 50% data growth perturbs the knife-edge training dynamics enough to
miss the lucky epoch, regardless of where the data comes from.

This control isolates the variable: train from scratch on 96 expert
trajs + 48 MORE EXPERT trajs collected in the SAME worlds (same world
seed) the on-policy arm used — identical volume growth, identical
worlds, only the visited-state distribution/controller differs.

- Control also collapses  -> the poison claim overreaches; the collapse
  is knife-edge training-dynamics sensitivity to any data change.
- Control stays healthy   -> the on-policy data itself is the poison.

Run (TPU, ~8 min):
    python scripts/collapse_control_probe.py --tpu --seed 1
"""

import argparse
import json
import pathlib
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np  # noqa: E402

import dagger_train as DT  # noqa: E402  (scripts/dagger_train.py)
from drone_oa_iree_vit_accelerator_tpu.train import dagger as DG  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    Trainer,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default="/tmp/collapse_control_probe.json")
    args = ap.parse_args()

    S = args.seed
    world_seed0 = 7000 + S * 100_000
    steps = 240 * 5  # matches the pipeline default (--frames 240)
    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:6.0f}s] {m}", flush=True)

    log(f"collecting 96 expert trajs (seed {world_seed0})...")
    base = DG.collect_expert_trajectories(
        DT.CFG, 96, wcfg=DT.WCFG, steps=steps, seed=world_seed0
    )
    # Same world seed the pipeline's round-1 ON-POLICY arm used — only
    # the controller differs (scripts/dagger_train.py round-k collection
    # uses seed world_seed0 + k).
    log(f"collecting 48 CONTROL expert trajs (seed {world_seed0 + 1})...")
    extra = DG.collect_expert_trajectories(
        DT.CFG, 48, wcfg=DT.WCFG, steps=steps, seed=world_seed0 + 1
    )
    trajs = base + extra
    log(f"aggregate: {len(base)} + {len(extra)} trajs")

    val = DT.ValLoop()
    tr = Trainer(
        TrainConfig(
            workspace="/tmp/collapse_control_ws",
            epochs=args.epochs,
            lr=3e-4,
            lr_warmup_epochs=3,
            batch_size=8,
            val_split=0.1,
            seed=42 + S,
            early_stopping_patience=args.epochs,
            save_model_freq=1000,
        ),
        trajectories=trajs,
    )
    hist = []

    def on_epoch(epoch, params):
        s = val.f32(params)
        hist.append(round(s, 4))
        log(f"epoch {epoch}: closed-loop val {s:.3f}")

    tr.train(on_epoch=on_epoch)

    report = {
        "seed": S,
        "arms": {
            "expert_96_only (round-0 cache)": "see policy_report round 0",
            "expert_96_plus_48_onpolicy": "retrain_scratch_probe (all 0.0)",
            "expert_96_plus_48_expert_control": hist,
        },
        "control_best": max(hist) if hist else None,
        "data": {
            "base": DT.data_stats(base),
            "extra_expert_control": DT.data_stats(extra),
        },
    }
    json.dump(report, open(args.out, "w"), indent=1)
    log(f"control best: {report['control_best']} -> {args.out}")


if __name__ == "__main__":
    main()
