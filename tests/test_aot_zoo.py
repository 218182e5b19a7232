"""Zoo-wide AOT regression net — the compile_flow_dummy_models.sh analog.

The reference batch-compiles a model corpus through its export toolchain
and records per-model pass/fail + compile statistics (reference
scripts/compile_flow_dummy_models.sh:44-86, compilation_info snapshots).
Here: EVERY zoo config exports through pipeline/aot.py (the .vmfb
analog), reloads in the same process, and must reproduce the live
serving step bit-for-bit over a state-threaded frame sequence; per-config
compile statistics land in docs/aot_zoo_compilation.json (the
compilation_info.txt analog, one section per config).

vitfly (the upstream ITALSTM family) is included via its own export
entry point (export_vitfly_step, the CompiledITALSTM analog).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core.config import MODEL_ZOO
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
    export_serving_step,
    export_vitfly_step,
    load_serving_step,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    make_serving_step,
    make_vitfly_serving_step,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq

DOCS = pathlib.Path(__file__).resolve().parents[1] / "docs"
REPORT = DOCS / "aot_zoo_compilation.json"


def _record(name: str, entry: dict) -> None:
    data = json.loads(REPORT.read_text()) if REPORT.exists() else {}
    data[name] = entry
    REPORT.write_text(json.dumps(data, indent=1, sort_keys=True))


def _frames(n, seed=0):
    return [
        jax.random.randint(
            jax.random.PRNGKey(seed + t), (60, 90), 0, 256, jnp.uint8
        )
        for t in range(n)
    ]


@pytest.mark.parametrize("name", sorted(MODEL_ZOO))
def test_zoo_config_aot_roundtrip(tmp_path, name):
    """Export -> reload -> bit-equal to the live step, state threaded.
    Every config ships its megakernel serving artifact (flagship:
    model_kernel; FLATTEN variants: flatten_kernel)."""
    cfg = MODEL_ZOO[name]
    key = jax.random.PRNGKey(11)
    params = M.init_params(cfg, key)
    cal = jax.random.randint(key, (4, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = calibrate_ptq(cfg, params, cal)

    art = export_serving_step(
        tmp_path / f"{name}.jaxexport", cfg,
        params=params, int_params=int_params, path="mega",
    )
    step, kp, _, meta = load_serving_step(art)
    assert meta["model"] == name and meta["path"] == "mega"

    live = make_serving_step(cfg, "mega")
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        _make_kernel_params,
    )

    kp_live = _make_kernel_params(cfg, params, int_params)
    st_a, st_l = M.zero_state(cfg, 1), M.zero_state(cfg, 1)
    vel, quat = jnp.float32(4.0), jnp.asarray([0.9, 0.1, 0.2, 0.3], jnp.float32)
    for t, img in enumerate(_frames(2)):
        pos_x = jnp.float32(1.0 + 2.0 * t)
        cmd_a, st_a = step(img, vel, pos_x, quat, st_a)
        cmd_l, st_l = live(kp_live, None, img, vel, pos_x, quat, st_l)
        np.testing.assert_allclose(
            np.asarray(cmd_a), np.asarray(cmd_l), rtol=1e-6, atol=1e-6
        )

    # Per-config compile statistics — the reference's per-model
    # compilation_info snapshot (scripts/compile_flow_dummy_models.sh
    # records pass/fail + stats per corpus model).
    from drone_oa_iree_vit_accelerator_tpu.tools.compile_stats import (
        compile_stats,
    )

    stats = compile_stats(
        live, kp_live, None, _frames(1)[0], vel, jnp.float32(1.0),
        quat, M.zero_state(cfg, 1),
    )
    _record(name, {
        "path": "mega",
        "artifact_bytes": art.stat().st_size,
        "platforms": meta["platforms"],
        "parity": "bit-level vs live step, 2 frames state-threaded",
        "compile_stats": {
            k: stats[k]
            for k in ("hlo_ops_total", "fusions", "custom_calls", "memory")
            if k in stats
        },
    })


def test_vitfly_aot_roundtrip(tmp_path):
    from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
    from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ

    vcfg = VF.VITFLY_LSTM
    key = jax.random.PRNGKey(13)
    params = VF.init_params(vcfg, key)
    obs = VQ.VitflyObservers.init(vcfg)
    for i in range(3):
        frame = jax.random.uniform(jax.random.fold_in(key, i), (1, 1, 60, 90))
        _, _, obs = VQ.vitfly_qat_forward(
            vcfg, params, obs, frame, jnp.ones((1, 1)),
            jnp.asarray([[1.0, 0, 0, 0]]),
        )
    vint = VQ.convert_vitfly_model(params, obs, vcfg)

    art = export_vitfly_step(
        tmp_path / "vitfly.jaxexport", params=params, vint_params=vint,
        path="int8",
    )
    step, _, _, meta = load_serving_step(art)
    assert meta["model"] == "vitfly_lstm"

    live = make_vitfly_serving_step(vcfg, "int8")
    st_a, st_l = M.zero_state(vcfg, 1), M.zero_state(vcfg, 1)
    vel, quat = jnp.float32(4.0), jnp.asarray([0.9, 0.1, 0.2, 0.3], jnp.float32)
    for t, img in enumerate(_frames(2, seed=50)):
        pos_x = jnp.float32(1.0 + 2.0 * t)
        cmd_a, st_a = step(img, vel, pos_x, quat, st_a)
        cmd_l, st_l = live(params, vint, img, vel, pos_x, quat, st_l)
        np.testing.assert_allclose(
            np.asarray(cmd_a), np.asarray(cmd_l), rtol=1e-6, atol=1e-6
        )

    _record("vitfly_lstm", {
        "path": "int8",
        "artifact_bytes": art.stat().st_size,
        "platforms": meta["platforms"],
        "parity": "bit-level vs live step, 2 frames state-threaded",
    })


def test_vitfly_aot_roundtrip_trained_artifact(tmp_path):
    """The SHIPPED trained vitfly checkpoint (scripts/vitfly_train.py
    lifecycle: expert -> float (per-epoch closed-loop selection) -> QAT
    -> int8) round-trips through AOT export with live parity — the
    trained-artifact analog of test_vitfly_aot_roundtrip's random-param
    check. Reference anchor: the alt path deploys a genuinely trained
    upstream checkpoint (models/converter_to_pt.py:15)."""
    from drone_oa_iree_vit_accelerator_tpu.models import params_io
    from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
    from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ

    ckpt = pathlib.Path(__file__).resolve().parents[1] / "checkpoints"
    if not (ckpt / "vitfly_float.npz").exists():
        pytest.skip("no trained vitfly artifact (run scripts/vitfly_train.py)")

    vcfg = VF.VITFLY_LSTM
    key = jax.random.PRNGKey(0)
    params = params_io.load_params(
        str(ckpt / "vitfly_float.npz"), VF.init_params(vcfg, key)
    )
    # int-params template from one observer pass, then overwrite with
    # the shipped artifact (the bench.py loading pattern).
    obs = VQ.VitflyObservers.init(vcfg)
    frame = jax.random.uniform(key, (1, 1, 60, 90))
    _, _, obs = VQ.vitfly_qat_forward(
        vcfg, params, obs, frame, jnp.ones((1, 1)),
        jnp.asarray([[1.0, 0, 0, 0]]),
    )
    vint = VQ.convert_vitfly_model(params, obs, vcfg)
    vint = params_io.load_params(str(ckpt / "vitfly_int8.npz"), vint)

    art = export_vitfly_step(
        tmp_path / "vitfly_trained.jaxexport", params=params,
        vint_params=vint, path="int8",
    )
    step, _, _, meta = load_serving_step(art)
    assert meta["model"] == "vitfly_lstm"

    live = make_vitfly_serving_step(vcfg, "int8")
    st_a, st_l = M.zero_state(vcfg, 1), M.zero_state(vcfg, 1)
    vel = jnp.float32(5.0)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    for t, img in enumerate(_frames(2, seed=77)):
        pos_x = jnp.float32(1.0 + 2.0 * t)
        cmd_a, st_a = step(img, vel, pos_x, quat, st_a)
        cmd_l, st_l = live(params, vint, img, vel, pos_x, quat, st_l)
        np.testing.assert_allclose(
            np.asarray(cmd_a), np.asarray(cmd_l), rtol=1e-6, atol=1e-6
        )
