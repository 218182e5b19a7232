"""Multi-chip (data-parallel) rollout throughput — the measured artifact
behind the DP claim (VERDICT r1 item 7: "a MULTICHIP-style JSON with
rollout throughput", beyond the correctness dryrun).

Two modes, merged into MULTICHIP_THROUGHPUT.json at the repo root:

  --mode cpu8   8 virtual CPU devices (the test topology): sharded
                closed-loop rollout (parallel/mesh.sharded_rollout) vs
                the same batch on ONE virtual device, with per-world
                outcome parity. One physical host core backs all 8
                virtual devices, so wall-clock equality — not speedup —
                is the expected result; the artifact proves the sharded
                program executes the same work and agrees per world.
                Real speedup needs real chips (ICI), which this host
                does not have (SURVEY: single axon chip).

  --mode tpu1   mesh-of-1 on the real TPU: sharded_rollout vs plain jit
                of the identical rollout_batch — parity of results and
                device-time overhead of the shard_map wrapper (should be
                ~zero: XLA elides collectives on a 1-device mesh).

Run cpu8 first (it must run in a process whose default backend is CPU
with 8 virtual devices), then tpu1; each merges its section into the
JSON.
"""

import argparse
import json
import pathlib
import sys
import time

# Pre-import scan (jax backend config must happen before first use).
# Handles both "--mode tpu1" and "--mode=tpu1" forms; argparse below
# re-validates against its choices.
MODE = "cpu8"
for _i, _a in enumerate(sys.argv):
    if _a == "--mode" and _i + 1 < len(sys.argv):
        MODE = sys.argv[_i + 1]
    elif _a.startswith("--mode="):
        MODE = _a.split("=", 1)[1]

import jax  # noqa: E402

if MODE in ("cpu8", "turbo_cpu8"):
    # A sitecustomize hook may have imported jax already with
    # JAX_PLATFORMS pointing at hardware; config.update still wins as
    # long as no backend was initialized (same dance as tests/conftest).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from drone_oa_iree_vit_accelerator_tpu.core.config import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)
from drone_oa_iree_vit_accelerator_tpu.parallel import mesh as PM  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim import rollout as R  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.sim import world as W  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "MULTICHIP_THROUGHPUT.json"


def load_params():
    like = M.init_params(CFG, jax.random.PRNGKey(0))
    ckpt = pathlib.Path(__file__).resolve().parents[1] / "checkpoints"
    if (ckpt / "model_float.npz").exists():
        return params_io.load_params(str(ckpt / "model_float.npz"), like)
    return like


def run_rollouts(fn, params, worlds, n_repeats=3):
    """Time jitted rollout executions (post-warmup best-of-n wall time)."""
    res = jax.block_until_ready(fn(params, None, worlds))  # warmup/compile
    times = []
    for _ in range(n_repeats):
        t0 = time.perf_counter()
        res = jax.block_until_ready(fn(params, None, worlds))
        times.append(time.perf_counter() - t0)
    return res, min(times)


def parity(res_a, res_b) -> dict:
    """Cross-topology agreement: per-world outcomes AND trajectory
    endpoints. Batch sharding must not change per-drone math (no
    cross-batch reductions in a rollout), so final_x should agree to the
    last ulp; outcomes alone are too coarse when the bench's short
    horizon means few drones finish."""
    fa, fb = np.asarray(res_a.final_x), np.asarray(res_b.final_x)
    return {
        "per_world_outcomes_equal": np.array_equal(
            np.asarray(res_a.success), np.asarray(res_b.success)
        ),
        "final_x_max_abs_diff": float(np.max(np.abs(fa - fb))),
        "mean_final_x": round(float(fa.mean()), 3),
    }


def merge(section: str, payload: dict) -> None:
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[section] = payload
    OUT.write_text(json.dumps(data, indent=2))
    print(json.dumps({section: payload}, indent=2))


def turbo_serve_section(mode: str) -> None:
    """DP-sharded batched SERVING on the headline turbo path (round 3):
    shard_map over the batch axis of make_batched_serving_step's
    computation — the fleet-scale inference story for the path that
    holds the throughput headline. Parity (exact) on cpu8's virtual
    topology; device-time overhead vs plain jit on the real chip."""
    from jax.sharding import PartitionSpec as P

    from drone_oa_iree_vit_accelerator_tpu.quant.batched import (
        make_tail,
        turbo_forward,
    )
    from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq

    import jax.numpy as jnp

    params = load_params()
    key = jax.random.PRNGKey(0)
    int_like, _ = calibrate_ptq(
        CFG, params, jax.random.randint(key, (8, 1, 60, 90), 0, 256, "uint8")
    )
    ckpt = pathlib.Path(__file__).resolve().parents[1] / "checkpoints"
    if (ckpt / "model_int8.npz").exists():
        int_like = params_io.load_params(str(ckpt / "model_int8.npz"), int_like)
    tail = make_tail(CFG, params, e_major=True)
    params = M.freeze_for_inference(CFG, params)

    b = 1024 if mode == "tpu1" else 64
    interp = mode != "tpu1"

    def fwd(p, ip, t, f_u8, v, q, s):
        f = f_u8.astype(jnp.float32) / 255.0
        return turbo_forward(
            CFG, p, ip, t, f, v, q, s, encoder="pallas_T", interpret=interp,
            max_nb=8,
        )

    n_dev = 8 if mode == "cpu8" else 1
    mesh = PM.make_mesh(n_dev)
    state_spec = P(None, PM.BATCH_AXIS)  # (L, B, H): shard the batch dim
    sharded = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(P(), P(), P(), P(PM.BATCH_AXIS), P(PM.BATCH_AXIS),
                      P(PM.BATCH_AXIS), (state_spec, state_spec)),
            out_specs=(P(PM.BATCH_AXIS), M.LSTMState(state_spec, state_spec)),
            check_vma=False,
        )
    )
    plain = jax.jit(fwd)

    def args_for(i):
        k = jax.random.PRNGKey(500 + i)
        frames = jax.random.randint(k, (b, 1, 60, 90), 0, 256, "uint8")
        vel = jnp.full((b, 1), 5.0)
        quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (b, 1))
        state = M.zero_state(CFG, b)
        return (params, int_like, tail, frames, vel, quat, tuple(state))

    a0 = args_for(0)
    cmd_s, _ = jax.block_until_ready(sharded(*a0))
    cmd_p, _ = jax.block_until_ready(plain(*a0))
    exact = bool(np.array_equal(np.asarray(cmd_s), np.asarray(cmd_p)))

    payload = {
        "path": "turbo (batched Pallas int8 encoder)",
        "batch": b,
        "n_devices": n_dev,
        "commands_bitwise_equal_vs_plain": exact,
        "max_abs_diff": float(
            np.max(np.abs(np.asarray(cmd_s) - np.asarray(cmd_p)))
        ),
    }
    if mode == "tpu1":
        from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (
            device_time_per_call,
        )

        t_s = device_time_per_call(
            sharded, [args_for(i + 1) for i in range(6)], warmup_args=a0
        )
        t_p = device_time_per_call(
            plain, [args_for(i + 1) for i in range(6)], warmup_args=a0
        )
        payload.update(
            sharded_mesh1_ms=round(t_s.per_call_ms, 4),
            plain_jit_ms=round(t_p.per_call_ms, 4),
            fps_sharded=round(b / t_s.per_call_ms * 1e3, 1),
            fps_plain=round(b / t_p.per_call_ms * 1e3, 1),
            note="shard_map over mesh-of-1 on the real chip; DP batch "
            "sharding of the headline serving path costs ~nothing",
        )
    else:
        payload["note"] = (
            "8 virtual CPU devices; Pallas encoder in interpret mode; "
            "bitwise command parity sharded-vs-plain is the deliverable"
        )
    merge(f"turbo_serve_{mode}", payload)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("cpu8", "tpu1", "turbo_cpu8", "turbo_tpu1"),
        default="cpu8",
    )
    ap.add_argument("--drones", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    if args.mode in ("turbo_cpu8", "turbo_tpu1"):
        turbo_serve_section(args.mode.split("_", 1)[1])
        return

    params = load_params()
    wcfg = W.WorldConfig()
    worlds = R.sample_worlds(jax.random.PRNGKey(7), args.drones, wcfg)
    frames = args.drones * args.steps

    def rollout(p, ip, w):
        return R.rollout_batch(
            CFG, p, ip, w, wcfg=wcfg, steps=args.steps, desired_vel=5.0,
            path="f32",
        )

    if args.mode == "cpu8":
        assert len(jax.devices()) == 8, jax.devices()
        mesh8 = PM.make_mesh(8)
        mesh1 = PM.make_mesh(1)
        res8, t8 = run_rollouts(
            PM.sharded_rollout(rollout, mesh8),
            PM.replicate(mesh8, params),
            PM.shard_batch(mesh8, worlds),
        )
        res1, t1 = run_rollouts(
            PM.sharded_rollout(rollout, mesh1),
            PM.replicate(mesh1, params),
            PM.shard_batch(mesh1, worlds),
        )
        merge(
            "cpu8_virtual",
            {
                "topology": "8 virtual CPU devices / 1 physical core",
                "drones": args.drones,
                "control_ticks": args.steps,
                "sharded_8dev_s": round(t8, 3),
                "sharded_8dev_frames_per_s": round(frames / t8, 1),
                "single_dev_s": round(t1, 3),
                **parity(res8, res1),
                "note": "one physical core backs all 8 virtual devices -> "
                "parity not speedup is the deliverable; ICI speedup "
                "requires a real multi-chip slice",
            },
        )
    else:
        # TRUE DEVICE TIME via profiler traces, distinct worlds per timed
        # call: host wall-time is a relay artifact on this platform and
        # the relay memoizes identical re-invocations (both measured —
        # see utils/device_timing.py).
        from drone_oa_iree_vit_accelerator_tpu.utils.device_timing import (
            device_time_per_call,
        )

        assert jax.default_backend() == "tpu", jax.default_backend()
        n_reps = 4
        world_sets = [
            R.sample_worlds(jax.random.PRNGKey(100 + i), args.drones, wcfg)
            for i in range(n_reps + 1)
        ]
        mesh1 = PM.make_mesh(1)
        sharded = PM.sharded_rollout(rollout, mesh1)
        p_rep = PM.replicate(mesh1, params)
        t_m = device_time_per_call(
            lambda p, w: sharded(p, None, w),
            [(p_rep, PM.shard_batch(mesh1, world_sets[i + 1]))
             for i in range(n_reps)],
            warmup_args=(p_rep, PM.shard_batch(mesh1, world_sets[0])),
        )
        plain = jax.jit(lambda p, w: rollout(p, None, w))
        t_p = device_time_per_call(
            plain,
            [(params, world_sets[i + 1]) for i in range(n_reps)],
            warmup_args=(params, world_sets[0]),
        )
        # Parity on one fixed world set.
        res_m = jax.block_until_ready(
            sharded(p_rep, None, PM.shard_batch(mesh1, world_sets[0]))
        )
        res_p = jax.block_until_ready(plain(params, world_sets[0]))
        merge(
            "tpu_mesh_of_1",
            {
                "device": jax.devices()[0].device_kind,
                "drones": args.drones,
                "control_ticks": args.steps,
                "sharded_mesh1_device_s": round(t_m.per_call_ms / 1e3, 4),
                "plain_jit_device_s": round(t_p.per_call_ms / 1e3, 4),
                "frames_per_s_mesh1": round(frames / (t_m.per_call_ms / 1e3), 1),
                "frames_per_s_plain": round(frames / (t_p.per_call_ms / 1e3), 1),
                **parity(res_m, res_p),
                "note": "device time from jax.profiler traces; shard_map "
                "over a 1-device mesh must cost ~nothing vs plain jit "
                "(XLA elides the collectives)",
            },
        )


if __name__ == "__main__":
    main()
