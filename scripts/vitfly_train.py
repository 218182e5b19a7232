"""Vitfly (upstream ITALSTM) end-to-end lifecycle: expert data -> float
train -> QAT -> int8 -> closed-loop evaluation (VERDICT r4 item 5).

Gives the alt family the same train/QAT/deploy/eval story as the
flagship (scripts/train_demo_policy.py + the dagger recipe's per-epoch
closed-loop selection — val LOSS is anti-correlated with closed-loop
success on this task, so every epoch runs the validation closed loop
and the best-by-success checkpoint wins). Artifacts:

    checkpoints/vitfly_float.npz   (selected float params, post-QAT)
    checkpoints/vitfly_int8.npz    (integer attention params for them)
    checkpoints/policy_report.json (merged 'vitfly' section)

Reference anchor: the reference's alt path deploys a genuinely trained
upstream checkpoint (models/converter_to_pt.py:15, scripts/
export_model.py:283); this script makes ours trainable end-to-end.

Run on CPU (default; the axon TPU tunnel penalizes host-sync-heavy
training loops):  python scripts/vitfly_train.py [--fast]
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

import numpy as np  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vitfly as VF,
)
from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import (  # noqa: E402
    rollout_batch,
    sample_worlds,
)
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train import dagger as DG  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train.trainer import (  # noqa: E402
    TrainConfig,
    Trainer,
)
from drone_oa_iree_vit_accelerator_tpu.train.vitfly_qat_trainer import (  # noqa: E402
    VitflyQATConfig,
    VitflyQATTrainer,
)

VCFG = VF.VITFLY_LSTM
WCFG = WorldConfig()
VAL_SEED = 880_000      # same exam as the flagship pipeline
HELDOUT_SEED = 990_000


class ValLoop:
    """Cached-jit closed-loop validators for the vitfly paths."""

    def __init__(self, n: int, steps: int):
        key = jax.random.PRNGKey(VAL_SEED)
        self.worlds = sample_worlds(jax.random.fold_in(key, 1), n, WCFG)
        self.steps = steps
        self._f32 = jax.jit(
            lambda p, w: rollout_batch(
                VCFG, p, None, w, wcfg=WCFG, steps=steps,
                desired_vel=5.0, path="vitfly_f32",
            )
        )
        self._int8 = jax.jit(
            lambda p, ip, w: rollout_batch(
                VCFG, p, ip, w, wcfg=WCFG, steps=steps,
                desired_vel=5.0, path="vitfly_int8",
            )
        )

    def f32(self, params) -> float:
        r = jax.block_until_ready(self._f32(params, self.worlds))
        return float(np.asarray(r.success).mean())

    def int8(self, params, vint) -> float:
        r = jax.block_until_ready(self._int8(params, vint, self.worlds))
        return float(np.asarray(r.success).mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="tiny smoke run")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/doa_vitfly_run")
    ap.add_argument("--out", default="checkpoints")
    ap.add_argument("--expert-trajs", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--qat-epochs", type=int, default=6)
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()

    val_n, val_steps, held_n, held_steps = 48, 1500, 64, 2000
    if args.fast:
        args.expert_trajs, args.epochs, args.qat_epochs = 4, 1, 1
        args.frames = 40
        val_n, val_steps, held_n, held_steps = 4, 300, 4, 300

    work = pathlib.Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.0f}s] {msg}", flush=True)

    # ---- expert data (same synthetic expert as the flagship) ----
    from drone_oa_iree_vit_accelerator_tpu.train import dataset as D

    d0 = work / "trajs.npz"
    if d0.exists():
        z = np.load(d0)
        trajs = [
            D.Trajectory(*[z[f"t{i}_{f}"] for f in D.Trajectory._fields])
            for i in range(int(z["n"]))
        ]
        log(f"loaded expert data ({len(trajs)} trajs)")
    else:
        log(f"collecting {args.expert_trajs} expert trajectories...")
        trajs = DG.collect_expert_trajectories(
            VCFG, args.expert_trajs, wcfg=WCFG, steps=args.frames * 5,
            seed=7000 + args.seed * 100_000,
        )
        np.savez_compressed(
            d0,
            **{f"t{i}_{f}": getattr(t, f)
               for i, t in enumerate(trajs) for f in t._fields},
            n=len(trajs),
        )
        log(f"expert data: {len(trajs)} trajs")

    val = ValLoop(val_n, val_steps)

    # ---- float training with per-epoch closed-loop selection ----
    tr = Trainer(
        TrainConfig(
            family="vitfly",
            workspace=str(work / "ws_float"),
            epochs=args.epochs,
            lr=3e-4,
            lr_warmup_epochs=min(3, args.epochs),
            batch_size=8,
            val_split=0.1,
            seed=42 + args.seed,
            early_stopping_patience=args.epochs,
            save_model_freq=1000,
        ),
        trajectories=trajs,
    )
    fb = {"success": -1.0, "epoch": -1, "params": tr.params}
    float_hist = []

    def on_epoch(epoch, params):
        s = val.f32(params)
        float_hist.append({"epoch": epoch, "val_success": round(s, 4)})
        log(f"float epoch {epoch}: closed-loop {s:.3f}")
        if s >= fb["success"]:
            fb.update(success=s, epoch=epoch, params=params)

    float_result = tr.train(on_epoch=on_epoch)
    log(f"float training done; best closed-loop {fb['success']:.3f} "
        f"(epoch {fb['epoch']})")
    params_io.save_params(str(work / "float_best.npz"), fb["params"])

    # ---- QAT fine-tune with per-epoch int8 closed-loop selection ----
    qtr = VitflyQATTrainer(
        VitflyQATConfig(
            family="vitfly",
            workspace=str(work / "ws_qat"),
            epochs=args.qat_epochs,
            batch_size=8,
            val_split=0.1,
            seed=42 + args.seed,
            early_stopping_patience=args.qat_epochs,
            load_checkpoint_qat=str(work / "float_best.npz"),
        ),
        trajectories=trajs,
    )
    # Observer warm-up: one calibration pass before any selection so
    # epoch-0 conversion has real ranges.
    qb = {"success": -1.0, "epoch": -1, "params": None, "vint": None}
    qat_hist = []

    def on_qat_epoch(epoch, params, vint):
        s = val.int8(params, vint)
        qat_hist.append({"epoch": epoch, "val_success": round(s, 4)})
        log(f"qat epoch {epoch}: int8 closed-loop {s:.3f}")
        if s >= qb["success"]:
            qb.update(success=s, epoch=epoch, params=params, vint=vint)

    qat_result = qtr.train(on_epoch=on_qat_epoch)
    if qb["params"] is None:  # no epochs ran
        qb.update(params=qtr.params, vint=qtr.int_params())
    log(f"QAT done; best int8 closed-loop {qb['success']:.3f} "
        f"(epoch {qb['epoch']})")

    params_io.save_params(str(out / "vitfly_float.npz"), qb["params"])
    params_io.save_params(str(out / "vitfly_int8.npz"), qb["vint"])
    log(f"saved {out}/vitfly_float.npz + vitfly_int8.npz")

    # ---- held-out closed-loop evaluation ----
    paths = ["vitfly_f32", "vitfly_int8"]
    if jax.default_backend() == "tpu":
        # The per-block-kernel path compiles on TPU; in CPU interpret
        # mode a 2000-step scan is impractically slow.
        paths.append("vitfly_pallas")
    report = {
        "float_train": {
            k: v for k, v in float_result.items() if k != "history"
        },
        "qat_train": {k: v for k, v in qat_result.items() if k != "history"},
        "float_epoch_selection": float_hist,
        "qat_epoch_selection": qat_hist,
        "val_success": {"f32": fb["success"], "int8": qb["success"]},
        "heldout": {},
    }
    for path in paths:
        s = E.evaluate(
            n_rollouts=held_n,
            steps=held_steps,
            seed=HELDOUT_SEED,
            path=path,
            cfg=VCFG,
            params=qb["params"],
            int_params=qb["vint"] if path != "vitfly_f32" else None,
            wcfg=WCFG,
            out_yaml=str(out / f"evaluation_{path}.yaml"),
        )
        report["heldout"][path] = {
            k: v for k, v in s.items() if k != "per_rollout"
        }
        log(f"held-out {path}: {report['heldout'][path]}")

    # Merge into the shared policy report under its own key.
    pr_path = out / "policy_report.json"
    pr = json.loads(pr_path.read_text()) if pr_path.exists() else {}
    pr["vitfly"] = report
    pr_path.write_text(json.dumps(pr, indent=2))
    log(f"report merged -> {pr_path} (key 'vitfly')")


if __name__ == "__main__":
    main()
