"""End-to-end demo-policy pipeline: data -> train -> QAT -> closed loop.

Reproduces the reference's full lifecycle (SURVEY.md sections 3.1/3.6) on
synthetic expert data: behavior-clone the potential-field expert, QAT
fine-tune, convert to int8, then evaluate all three serving paths
closed-loop in the batched sim. Artifacts land in checkpoints/:

    model_float.npz, model_int8.npz, policy_report.json

Run on CPU (the model is tiny; the axon TPU tunnel penalizes the
host-sync-heavy training loop):

    python scripts/train_demo_policy.py [--fast]
"""

import argparse
import json
import pathlib
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train import dataset as D  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train.qat_trainer import (  # noqa: E402
    QATConfig,
    QATTrainer,
)
from drone_oa_iree_vit_accelerator_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    Trainer,
)
from drone_oa_iree_vit_accelerator_tpu.models import params_io  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="tiny smoke run")
    ap.add_argument("--workdir", default="/tmp/doa_policy_run")
    ap.add_argument("--out", default="checkpoints")
    args = ap.parse_args()

    work = pathlib.Path(args.workdir)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    n_traj = 8 if args.fast else 64
    steps = 40 if args.fast else 160
    epochs = 2 if args.fast else 40
    qat_epochs = 1 if args.fast else 8

    t0 = time.time()
    data_dir = work / "data"
    if not (data_dir / "trajectory_0000" / "data.csv").exists():
        print(f"generating {n_traj} expert trajectories...", flush=True)
        D.generate_synthetic(data_dir, n_trajectories=n_traj, steps=steps, seed=7)
    print(f"dataset ready ({time.time()-t0:.0f}s)", flush=True)

    tr = Trainer(
        TrainConfig(
            dataset_dir=str(data_dir),
            workspace=str(work / "ws_float"),
            epochs=epochs,
            lr=3e-4,
            lr_warmup_epochs=min(3, epochs),
            batch_size=8,
            val_split=0.15,
            early_stopping_patience=8,
            save_model_freq=10,
        )
    )
    float_result = tr.train()
    print(f"float training done ({time.time()-t0:.0f}s)", flush=True)

    qtr = QATTrainer(
        QATConfig(
            dataset_dir=str(data_dir),
            workspace=str(work / "ws_qat"),
            epochs=qat_epochs,
            batch_size=8,
            val_split=0.15,
            load_checkpoint_qat=str(work / "ws_float" / "model_final.npz"),
        )
    )
    qat_result = qtr.train()
    int_params = qtr.load_int_params()
    print(f"QAT done ({time.time()-t0:.0f}s)", flush=True)

    params_io.save_params(str(out / "model_float.npz"), qtr.params)
    params_io.save_params(str(out / "model_int8.npz"), int_params)

    # Closed-loop evaluation, all three paths, shared worlds.
    wcfg = WorldConfig()
    report = {
        "float_train": {k: v for k, v in float_result.items() if k != "history"},
        "qat_train": {k: v for k, v in qat_result.items() if k != "history"},
        "closed_loop": {},
    }
    for path in ("f32", "int8", "pallas"):
        s = E.evaluate(
            n_rollouts=4 if args.fast else 16,
            steps=300 if args.fast else 2000,
            seed=123,
            path=path,
            params=qtr.params,
            int_params=int_params if path != "f32" else None,
            wcfg=wcfg,
            out_yaml=str(out / f"evaluation_{path}.yaml"),
        )
        report["closed_loop"][path] = {
            k: v for k, v in s.items() if k != "per_rollout"
        }
        print(f"closed-loop {path}: {report['closed_loop'][path]}", flush=True)

    with open(out / "policy_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(f"all done ({time.time()-t0:.0f}s); report -> {out}/policy_report.json")


if __name__ == "__main__":
    main()
