"""r5 mix-collection deploy challenge: evaluate the --collect-from mix
candidate (runs/dagger_r5_mix_seed0) and the shipped incumbent on the
neutral 256-world expanded validation, copy the artifact into
checkpoints/ ONLY if the candidate wins (the incumbent-protected
finalize contract, scripts/dagger_finalize_r4.py), and record the
result under its own policy_report key (r5_mix_finalize) so the r4
3-seed record is never clobbered.
"""

import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core.config import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import params_io
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as MDL
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq
from drone_oa_iree_vit_accelerator_tpu.sim.rollout import (
    rollout_batch,
    sample_worlds,
)
from drone_oa_iree_vit_accelerator_tpu.sim.world import WorldConfig

EXPANDED_VAL_SEED = 880_001
EXPANDED_VAL_N = 256


def main() -> None:
    root = pathlib.Path(__file__).resolve().parents[1]
    cand_dir = root / "runs" / "dagger_r5_mix_seed0"
    ckpt = root / "checkpoints"

    wcfg = WorldConfig()
    worlds = sample_worlds(
        jax.random.fold_in(jax.random.PRNGKey(EXPANDED_VAL_SEED), 1),
        EXPANDED_VAL_N, wcfg,
    )
    run = jax.jit(
        lambda p, ip, w: rollout_batch(
            CFG, p, ip, w, wcfg=wcfg, steps=2000, desired_vel=5.0,
            path="int8",
        )
    )
    key = jax.random.PRNGKey(0)
    p0 = MDL.init_params(CFG, key)
    ip0, _ = calibrate_ptq(
        CFG, p0, jax.random.randint(key, (8, 1, 60, 90), 0, 256, "uint8")
    )

    def expanded_val(float_npz, int_npz) -> float:
        p = params_io.load_params(str(float_npz), p0)
        ip = params_io.load_params(str(int_npz), ip0)
        res = jax.block_until_ready(run(p, ip, worlds))
        return float(np.asarray(res.success).mean())

    v_mix = expanded_val(cand_dir / "model_float.npz",
                         cand_dir / "model_int8.npz")
    print(f"r5 mix seed 0: expanded-val {v_mix:.4f}", flush=True)
    v_inc = expanded_val(ckpt / "model_float.npz", ckpt / "model_int8.npz")
    print(f"incumbent: expanded-val {v_inc:.4f}", flush=True)

    winner = "r5_mix_seed0" if v_mix > v_inc else "incumbent"
    if winner == "r5_mix_seed0":
        for fn in ("model_float.npz", "model_int8.npz",
                   "evaluation_64worlds.json"):
            if (cand_dir / fn).exists():
                shutil.copy(cand_dir / fn, ckpt / fn)
        for fn in cand_dir.glob("evaluation_*.yaml"):
            shutil.copy(fn, ckpt / fn.name)

    cand_report = json.loads((cand_dir / "policy_report.json").read_text())
    pr_path = ckpt / "policy_report.json"
    pr = json.loads(pr_path.read_text())
    arm = pr.get("r5_mix_collection_arm", {})
    arm.update(
        status="complete",
        round_vals={str(h["round"]): h["val_success"]
                    for h in cand_report["dagger_history"]},
        selected=f"round {cand_report['selected_round']} "
                 f"epoch {cand_report['selected_epoch']} "
                 f"(val {cand_report['val_success']})",
        heldout_64={k: v["success_rate"]
                    for k, v in cand_report["heldout_64_worlds"].items()},
        stability_read=(
            "no round below 0.594 and three consecutive rounds >= 0.92 "
            "(0.984/0.953/0.922) — the first seed-0 arm whose DAgger "
            "rounds stay above the round-0 baseline instead of "
            "oscillating (r4 latest-probe: 0.375->0.734->0.359->0.922; "
            "r4 production best-arm plateau: 0.469)"
        ),
        expanded_val_256={"r5_mix_seed0": round(v_mix, 4),
                          "incumbent": round(v_inc, 4)},
        deploy_decision=(
            f"winner: {winner} — files copied into checkpoints/ only on "
            "a mix win, so the shipped artifact can never regress"
        ),
    )
    pr["r5_mix_collection_arm"] = arm
    pr_path.write_text(json.dumps(pr, indent=2))
    print(json.dumps({"winner": winner, "mix": v_mix, "incumbent": v_inc}))


if __name__ == "__main__":
    main()
