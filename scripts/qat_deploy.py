"""QAT fine-tune -> int8 deployment artifact, selected by closed-loop.

VERDICT r1 item 4: ship a QAT-finetuned artifact (or a measured
justification for PTQ). The naive run (scripts/dagger_train.py) showed
two traps, both measured:

1. fine-tuning the selected policy on the FULL DAgger aggregate
   (rounds 0-4) collapses closed-loop success even in float (round-3
   float retrain: 96.9% -> 18.8%) — so QAT must fine-tune on the same
   data slice the selected policy was trained on (rounds 0-2);
2. val LOSS is anti-correlated with closed-loop success (a z-channel
   bias worth <2% of the MSE crashes every world), so epoch selection
   must use closed-loop success of the INT8 path — the artifact that
   actually deploys (the reference selects QAT checkpoints by val loss,
   training/qa_train.py:62-73; it has no closed loop in training).

Observers are warm-started from PTQ calibration so the first fine-tune
steps see converged scales instead of first-batch extrema.

Outputs: checkpoints/model_{float,int8}.npz (winner of QAT vs PTQ on
validation closed-loop), updated policy_report.json with both measured,
fresh held-out 64-world evaluation.

    nohup python scripts/qat_deploy.py --tpu > /tmp/qat_deploy.log 2>&1 &
"""

import argparse
import faulthandler
import json
import pathlib
import signal
import sys
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> -> stack dump

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.core.config import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)
from drone_oa_iree_vit_accelerator_tpu import quant as QZ  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim import evaluate as E  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.train.qat_trainer import (  # noqa: E402
    QATConfig,
    QATTrainer,
)

from dagger_train import load_trajs  # noqa: E402  (same scripts/ dir)

VAL_SEED, HELDOUT_SEED = 880_000, 990_000
WCFG = WorldConfig()


def closed_loop(params, int_params=None, path="f32", n=32, seed=VAL_SEED,
                steps=2000, out_yaml=None):
    return E.evaluate(
        n_rollouts=n, steps=steps, seed=seed, path=path, params=params,
        int_params=int_params, wcfg=WCFG, out_yaml=out_yaml,
    )


def outcome_vector(stats) -> list:
    """Per-world success outcomes (bool) — the cross-path identity check
    compares outcomes, not float times: the pallas path's NHWC float glue
    legitimately reorders f32 reductions vs the XLA int8 path, so
    trajectories can differ in the last ulp while the integer region is
    bit-identical (tests/test_pallas_kernel.py)."""
    return [bool(r["success"]) for r in stats["per_rollout"]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/doa_dagger")
    ap.add_argument("--out", default="checkpoints")
    ap.add_argument("--data-rounds", type=int, default=2,
                    help="use DAgger data rounds 0..N (the selected "
                    "policy's training slice)")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=5e-6)
    ap.add_argument("--val-rollouts", type=int, default=32)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    work = pathlib.Path(args.workdir)
    out = pathlib.Path(args.out)
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.0f}s] {msg}", flush=True)

    trajs = []
    for k in range(args.data_rounds + 1):
        p = work / f"trajs_round{k}.npz"
        if p.exists():
            trajs += load_trajs(p)
    log(f"training slice: rounds 0..{args.data_rounds}, {len(trajs)} trajs")

    like = M.init_params(CFG, jax.random.PRNGKey(0))
    params = params_io.load_params(str(work / "params_best.npz"), like)

    # ---- PTQ baseline (also warm-starts the QAT observers) ----
    frames_cal = np.concatenate([t.frames[:16] for t in trajs[:8]], axis=0)
    ptq_int, ptq_obs = calibrate_ptq(CFG, params, frames_cal)
    val_ptq = closed_loop(params, ptq_int, path="int8", n=args.val_rollouts)
    log(f"PTQ int8 val: {val_ptq['success_rate']:.3f}")

    # ---- QAT fine-tune, epoch-selected by closed-loop int8 success ----
    qtr = QATTrainer(
        QATConfig(
            workspace=str(work / "ws_qat_deploy"),
            epochs=args.epochs,
            lr=args.lr,
            batch_size=8,
            val_split=0.1,
        ),
        trajectories=trajs,
    )
    qtr.params = params
    qtr.observers = ptq_obs  # warm start: converged scales from step 0

    best = {"success": -1.0, "epoch": -1, "params": None, "int": None}
    history = []
    for epoch in range(args.epochs):
        train_loss = qtr.train_one_epoch(epoch)
        int_params = jax.jit(QZ.convert_model, static_argnums=2)(
            qtr.params, qtr.observers, CFG.H
        )
        val = closed_loop(qtr.params, int_params, path="int8",
                          n=args.val_rollouts)
        log(f"qat epoch {epoch}: train {train_loss:.4f}, "
            f"int8 closed-loop val {val['success_rate']:.3f}")
        history.append({"epoch": epoch, "train": train_loss,
                        "int8_val_success": val["success_rate"]})
        if val["success_rate"] >= best["success"]:
            best.update(success=val["success_rate"], epoch=epoch,
                        params=qtr.params, int=int_params)

    log(f"QAT best epoch {best['epoch']}: int8 val {best['success']:.3f} "
        f"(PTQ {val_ptq['success_rate']:.3f})")

    # ---- replay L2 error vs ground-truth labels (VERDICT r1 item 4's
    # second axis, tools/replay_eval semantics) on the held-back val
    # trajectories; tie-breaker when closed-loop success is equal ----
    from drone_oa_iree_vit_accelerator_tpu.tools.replay_eval import replay_batch
    from drone_oa_iree_vit_accelerator_tpu.train import dataset as D
    import jax.numpy as jnp

    val_batch = D.pad_batch(qtr.val_trajs)
    dev = {k: jnp.asarray(v) for k, v in val_batch._asdict().items()}
    run = jax.jit(lambda p, ip, b: replay_batch(CFG, p, ip, b, "int8"))

    def replay_l2(p, ip):
        cmds = np.asarray(run(p, ip, dev))
        err = np.linalg.norm(cmds - val_batch.cmd_gt, axis=-1) * val_batch.mask
        return float(err.sum() / max(val_batch.mask.sum(), 1))

    l2_ptq = replay_l2(params, ptq_int)
    l2_qat = replay_l2(best["params"], best["int"])
    log(f"replay L2 vs labels (val trajs): PTQ {l2_ptq:.4f}, QAT {l2_qat:.4f}")

    # ---- deploy the winner: closed-loop success first, replay L2 on tie ----
    qat_wins = best["success"] > val_ptq["success_rate"] or (
        best["success"] == val_ptq["success_rate"] and l2_qat <= l2_ptq
    )
    if qat_wins:
        deploy_params, deploy_int = best["params"], best["int"]
        provenance = (
            f"QAT fine-tune (epoch {best['epoch']}, closed-loop-selected: "
            f"int8 val {best['success']:.3f} vs PTQ "
            f"{val_ptq['success_rate']:.3f}; replay L2 {l2_qat:.4f} vs "
            f"{l2_ptq:.4f})"
        )
    else:
        deploy_params, deploy_int = params, ptq_int
        provenance = (
            f"PTQ (measured: best QAT int8 val {best['success']:.3f} vs "
            f"PTQ {val_ptq['success_rate']:.3f}; replay L2 {l2_qat:.4f} vs "
            f"{l2_ptq:.4f})"
        )
    log(f"deploying {provenance}")
    params_io.save_params(str(out / "model_float.npz"), deploy_params)
    params_io.save_params(str(out / "model_int8.npz"), deploy_int)

    # ---- held-out evaluation (seed disjoint from selection) ----
    heldout, outcomes = {}, {}
    for path in ("f32", "int8", "pallas"):
        s = closed_loop(
            deploy_params, deploy_int if path != "f32" else None, path=path,
            n=64, seed=HELDOUT_SEED,
            out_yaml=str(out / f"evaluation_{path}.yaml"),
        )
        outcomes[path] = outcome_vector(s)
        s.pop("per_rollout")
        heldout[path] = s
        log(f"held-out {path}: {s}")

    report_path = out / "policy_report.json"
    report = json.loads(report_path.read_text()) if report_path.exists() else {}
    report.pop("int8_pallas_identical_per_world", None)  # superseded (outcome-based below)
    report.update(
        quantization={
            "deployed": provenance,
            "ptq_val_success": val_ptq["success_rate"],
            "qat_best_int8_val_success": best["success"],
            "replay_l2_vs_labels": {"ptq": l2_ptq, "qat": l2_qat},
            "qat_epoch_history": history,
            "qat_data_slice": f"DAgger rounds 0..{args.data_rounds} "
            f"({len(trajs)} trajs; full-aggregate fine-tuning measured "
            "harmful: float round-3 retrain 0.969 -> 0.188)",
            "observer_warm_start": "PTQ calibration",
            "epoch_selection": "closed-loop int8 success on val worlds",
        },
        heldout_64_worlds=heldout,
        int8_pallas_same_outcome_per_world=outcomes["int8"] == outcomes["pallas"],
    )
    report_path.write_text(json.dumps(report, indent=2))
    with open(out / "evaluation_64worlds.json", "w") as f:
        json.dump(heldout, f, indent=2)
    log(f"done; report -> {report_path}")


if __name__ == "__main__":
    main()
