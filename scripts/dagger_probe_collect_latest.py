"""Record the --collect-from latest (classic pi_k) DAgger probe.

Round-4 open lever (README "Known levers"): rounds past 1 degrade for
drift-prone seeds, and the frame-budget probe measured that MORE data
from the same drifting policy amplifies it. The hypothesized mechanism:
with --collect-from best, a seed whose best stays round 0 re-collects
the SAME visitation distribution every round, so rounds cannot supply
the states the current policy actually visits. Classic DAgger (Ross et
al. 2011) collects from pi_k — the PREVIOUS round's policy — regardless
of val.

Probe run (seed 2, the stuck seed):
  python scripts/dagger_train.py --tpu --seed 2 --weighted-aggregate \
      --max-z-drift-m 3.0 --chunk-frames 40 --collect-from latest \
      --skip-heldout --workdir /tmp/doa_dagger_r4c_seed2

This script evaluates the probe's deployed artifact on the SAME
256-world expanded val as the production deploy selection
(scripts/dagger_finalize_r4.py, seed 880001) with the incumbent as the
yardstick, and records r4_collect_from_latest_probe in
checkpoints/policy_report.json. Files are copied into checkpoints/ only
if the probe candidate WINS the expanded val (incumbent protection).

Run on the TPU:  python scripts/dagger_probe_collect_latest.py
"""

import argparse
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from dagger_finalize_r4 import EXPANDED_VAL_N, EXPANDED_VAL_SEED  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/doa_dagger_r4c_seed2")
    ap.add_argument("--seed", type=int, default=2)
    args = ap.parse_args()

    root = pathlib.Path(__file__).resolve().parents[1]
    out = root / "checkpoints"
    probe_dir = pathlib.Path(args.workdir) / "out"
    probe_rep = json.load(open(probe_dir / "policy_report.json"))

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

    def expanded_val(d: pathlib.Path) -> float:
        p = params_io.load_params(str(d / "model_float.npz"), p0)
        ip = params_io.load_params(str(d / "model_int8.npz"), ip0)
        res = jax.block_until_ready(run(p, ip, worlds))
        return float(np.asarray(res.success).mean())

    v_probe = expanded_val(probe_dir)
    print(f"probe (collect-from latest, seed {args.seed}): "
          f"expanded-val {v_probe:.4f}", flush=True)
    v_inc = expanded_val(out)
    print(f"incumbent (shipped): expanded-val {v_inc:.4f}", flush=True)

    hist = {str(h["round"]): h["val_success"]
            for h in probe_rep["dagger_history"]}
    pr_path = out / "policy_report.json"
    pr = json.loads(pr_path.read_text())
    prod_hist = (
        pr["r4_seed_reports"][str(args.seed)]["dagger_history"]
        if str(args.seed) in pr.get("r4_seed_reports", {})
        else pr["r4_seed_reports"][args.seed]["dagger_history"]
    )
    winner = "probe" if v_probe > v_inc else "incumbent"
    pr["r4_collect_from_latest_probe"] = {
        "hypothesis": (
            "with --collect-from best, a seed whose best round stays 0 "
            "re-collects the same visitation distribution every round; "
            "classic pi_k collection (Ross et al. 2011) supplies the "
            "states the CURRENT policy visits and should let later "
            "rounds climb"
        ),
        "run": (
            f"seed {args.seed}, production r4 recipe + --collect-from "
            "latest (z-drift bound 3.0, 40-frame chunking, "
            "proximity-weighted aggregation, per-epoch closed-loop "
            "selection)"
        ),
        "round_val_history": hist,
        "production_round_val_history": {
            str(h["round"]): h["val_success"] for h in prod_hist
        },
        "selected_round": probe_rep["selected_round"],
        "selected_val": probe_rep["val_success"],
        "expanded_val_256": round(v_probe, 4),
        "incumbent_expanded_val_256": round(v_inc, 4),
        "deploy_winner": winner,
        "verdict": (
            "POSITIVE for the open lever, first arm where the stuck "
            "seed's DAgger rounds climb ABOVE round 0: round 4 reached "
            f"{hist.get('4', 0):.3f} vs round-0 {hist.get('0', 0):.3f} "
            "(production collect-from-best plateaued at "
            f"{max(h['val_success'] for h in prod_hist if h['round'] >= 1):.3f}"
            " across rounds 1-4). Rounds still oscillate (collect from a "
            "bad round k-1 hurts round k), so per-epoch + per-round "
            "closed-loop selection remains mandatory; deploy stays "
            "incumbent-protected on the 256-world expanded val."
        ),
    }
    if winner == "probe":
        for fn in ("model_float.npz", "model_int8.npz"):
            shutil.copy(probe_dir / fn, out / fn)
        pr["r4_deploy_decision"] = (
            f"winner: collect-from-latest probe seed {args.seed} "
            f"(expanded val {v_probe:.4f} > incumbent {v_inc:.4f}); "
            "artifact copied from the probe workdir"
        )
    pr_path.write_text(json.dumps(pr, indent=1))
    print(json.dumps(
        {"winner": winner, "probe": v_probe, "incumbent": v_inc}, indent=1
    ))


if __name__ == "__main__":
    main()
