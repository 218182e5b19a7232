"""Aggregate multi-seed DAgger runs into the deployed policy report.

Reads /tmp/doa_dagger_r3_seed{S}/out/policy_report.json for each seed
given on the CLI, computes mean±std of held-out success per serving
path (VERDICT r2 item 4: ">=3 training seeds ... mean±std"), selects
the deploy seed, copies its artifact into checkpoints/, and writes
checkpoints/policy_report.json carrying every seed's full history plus
the collapse diagnosis derived from the per-round data statistics.

Deploy selection: each seed's deployed int8 artifact is re-evaluated
closed-loop on an EXPANDED validation set (256 fresh worlds, seed
family 880001 — disjoint from both the 64-world training-time val set
and the held-out set, which influences nothing). Rationale, measured:
the 64-world val signal has ~±6% binomial noise and per-epoch
selection can crown a single-epoch spike (seed 1 round 0: epoch
history 0.30 → 0.94 → 0.28; its 0.938 "best" scored 0.80 on held-out),
so cross-seed selection needs a lower-variance estimate. Run on the
chip:

    python scripts/dagger_aggregate.py --seeds 0 1 2
"""

import argparse
import json
import pathlib
import shutil
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

EXPANDED_VAL_SEED = 880_001
EXPANDED_VAL_N = 256


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    ap.add_argument("--workdir-tpl", default="/tmp/doa_dagger_r3_seed{S}")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = pathlib.Path(__file__).resolve().parents[1]
    out = pathlib.Path(args.out or (root / "checkpoints"))

    reports = {}
    for S in args.seeds:
        p = pathlib.Path(args.workdir_tpl.format(S=S)) / "out"
        reports[S] = {
            "report": json.load(open(p / "policy_report.json")),
            "dir": p,
        }

    missing = [s for s, r in reports.items()
               if "heldout_64_worlds" not in r["report"]]
    if missing:
        sys.exit(
            f"seeds {missing} were run with --skip-heldout (no "
            "heldout_64_worlds in their policy_report.json); re-run "
            "scripts/dagger_train.py for those seeds without the flag — "
            "the mean±std report needs every seed's held-out block"
        )
    paths = ("f32", "int8", "pallas", "mega")
    agg = {}
    for path in paths:
        vals = [
            r["report"]["heldout_64_worlds"][path]["success_rate"]
            for r in reports.values()
        ]
        agg[path] = {
            "per_seed": {s: round(v, 4) for s, v in zip(reports, vals)},
            "mean": round(statistics.mean(vals), 4),
            "std": round(statistics.stdev(vals), 4) if len(vals) > 1 else 0.0,
        }

    # Deploy selection: each seed's deployed int8 artifact on the
    # expanded validation set (see module docstring; held-out untouched).
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
    for S, r in reports.items():
        p = params_io.load_params(str(r["dir"] / "model_float.npz"), p0)
        ip = params_io.load_params(str(r["dir"] / "model_int8.npz"), ip0)
        res = jax.block_until_ready(run(p, ip, worlds))
        r["expanded_val"] = float(np.asarray(res.success).mean())
        print(f"seed {S}: expanded-val ({EXPANDED_VAL_N} worlds) "
              f"{r['expanded_val']:.4f}  (64-world val "
              f"{r['report']['val_success']:.4f})")

    deploy_seed = max(
        reports,
        key=lambda s: (reports[s]["expanded_val"],
                       reports[s]["report"]["val_success"], -s),
    )
    src = reports[deploy_seed]["dir"]
    for fn in ("model_float.npz", "model_int8.npz",
               "evaluation_64worlds.json"):
        if (src / fn).exists():
            shutil.copy(src / fn, out / fn)
    for fn in src.glob("evaluation_*.yaml"):
        shutil.copy(fn, out / fn.name)

    # Collapse diagnosis: correlate per-round val success with the
    # aggregated data's distribution stats across all seeds.
    diagnosis_rows = []
    for S, r in reports.items():
        for h in r["report"]["dagger_history"]:
            diagnosis_rows.append({
                "seed": S, "round": h["round"],
                "val_success": h["val_success"],
                "epoch_spread": (
                    max(e["val_success"] for e in h["epoch_val_history"])
                    - min(e["val_success"] for e in h["epoch_val_history"])
                ) if h.get("epoch_val_history") else None,
                **{f"new_{k}": v for k, v in h["new_data"].items()},
            })

    report = {
        "round": 3,
        "seeds": list(reports),
        "deploy_seed": deploy_seed,
        "deploy_selection": (
            f"expanded validation closed-loop success ({EXPANDED_VAL_N} "
            f"worlds, seed {EXPANDED_VAL_SEED}; held-out untouched) — "
            "64-world val noise (~±6%) is the same order as the seed "
            "spread, and per-epoch selection can crown a single-epoch "
            "spike (seed 1: 0.938 val vs 0.797 held-out)"
        ),
        "expanded_val_by_seed": {
            s: round(r["expanded_val"], 4) for s, r in reports.items()
        },
        "heldout_success_by_path": agg,
        "per_seed_reports": {s: r["report"] for s, r in reports.items()},
        "collapse_diagnosis_rows": diagnosis_rows,
        "collapse_diagnosis": (
            "Two measured mechanisms (collapse_diagnosis_rows). "
            "(1) Knife-edge parameter sensitivity: closed-loop success "
            "is a discontinuous function of the policy — adjacent SGD "
            "epochs swing 0.30 -> 0.94 -> 0.28 (epoch_spread up to 0.94 "
            "within one round) while val LOSS moves smoothly, so "
            "per-epoch closed-loop selection inside every round is "
            "mandatory, and a single-epoch spike can be a "
            "non-generalizing artifact (seed 1: 0.938 val, 0.797 "
            "held-out — why cross-seed deploy selection re-evaluates on "
            "256 expanded-val worlds). (2) On-policy distribution "
            "shift, now quantified: round-0 expert data has "
            "near_obstacle_frac ~0.23; every on-policy round drops to "
            "0.04-0.11 (cruise-dominated). For the seeds whose rounds "
            "collapsed to 0.00, the relabeled data also carries 5x "
            "larger expert lateral commands (mean_abs_lateral_cmd "
            "1.22-1.26 vs 0.23-0.28) — the expert issuing large "
            "corrections toward the corridor on the drifting cruise "
            "states the selected (knife-edge) policy visits — and "
            "fine-tuning on that aggregate teaches open-space swerving, "
            "collapsing success. Seed 0, whose on-policy relabels "
            "stayed in-distribution (lat 0.26-0.28), recovered and "
            "improved to 0.906 by round 3. This is also why QAT "
            "fine-tunes on the selected round's data slice only."
        ),
    }
    with open(out / "policy_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "deploy_seed": deploy_seed,
        "heldout": {p: agg[p] for p in paths},
    }, indent=2))


if __name__ == "__main__":
    main()
