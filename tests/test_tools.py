"""Tools: AOT export/reload, compile stats, inspector, replay comparator,
and the QAT-only-attn ablation."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_BASE,
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.pipeline import wire
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    _calibrate_random,
    make_serving_step,
)
from drone_oa_iree_vit_accelerator_tpu import quant as QZ
from drone_oa_iree_vit_accelerator_tpu.tools import (
    compile_stats as CS,
    inspect_quantized as IQ,
    replay_eval as RE,
)


@pytest.fixture(scope="module")
def model():
    params = M.init_params(CFG, jax.random.PRNGKey(0))
    return params, _calibrate_random(CFG, params)


def test_aot_export_roundtrip(tmp_path, model):
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        export_serving_step,
        load_serving_step,
    )

    params, ip = model
    art = tmp_path / "model.jaxexport"
    export_serving_step(art, CFG, params=params, int_params=ip, path="int8")
    assert art.stat().st_size > 10_000

    step, p2, ip2, meta = load_serving_step(art)
    assert meta["model"] == CFG.name and meta["path"] == "int8"

    img = jnp.full(wire.IMAGE_SHAPE, 100, jnp.uint8)
    args = (img, jnp.float32(2.0), jnp.float32(5.0),
            jnp.zeros((4,), jnp.float32), M.zero_state(CFG, 1))
    cmd, st = step(*args)
    # Matches the live (non-exported) step exactly.
    live = make_serving_step(CFG, "int8")
    cmd_ref, _ = live(params, ip, *args)
    np.testing.assert_allclose(np.asarray(cmd), np.asarray(cmd_ref), atol=1e-6)


def test_compile_stats(model):
    params, ip = model
    step = make_serving_step(CFG, "int8")
    args = (params, ip, jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8),
            jnp.float32(1.0), jnp.float32(5.0), jnp.zeros((4,), jnp.float32),
            M.zero_state(CFG, 1))
    stats = CS.compile_stats(step, *args)
    assert stats["hlo_ops_total"] > 50
    assert any("dot" in k or "convolution" in k for k in stats["hlo_op_histogram"])


def test_inspector_reports_all_stages(model):
    _, ip = model
    rows = IQ.inspect(ip)
    layers = {r["layer"] for r in rows}
    for expected in (
        "block0.attn.q_proj", "block0.attn.qk_matmul", "block0.attn.softmax",
        "block0.attn.av_matmul", "block0.attn.out_proj",
        "block0.ffn.fc1", "block0.ffn.relu", "block0.ffn.fc2",
    ):
        assert expected in layers
    q = next(r for r in rows if r["layer"] == "block0.attn.q_proj")
    assert -128 <= q["weight_int_range"][0] <= q["weight_int_range"][1] <= 127
    assert 0 < q["requant"]["mult"] <= 256
    json.dumps(rows)  # serializable


def test_replay_eval_on_synthetic(tmp_path, model):
    from drone_oa_iree_vit_accelerator_tpu.train.dataset import generate_synthetic

    params, ip = model
    generate_synthetic(tmp_path / "data", n_trajectories=2, steps=10)
    res = RE.evaluate_replay(str(tmp_path / "data"), CFG, params, ip, "int8")
    assert res["trajectories"] == 2
    assert np.isfinite(res["mean_l2_error"])
    assert len(res["per_trajectory"]) == 2
    assert res["per_trajectory"][0]["frames"] == 10


def test_qat_only_attn_ablation(model):
    params, ip = model
    frame = jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 60, 90))
    vel = jnp.ones((1, 1))
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    cmd_full, _ = QZ.int8_forward(CFG, params, ip, frame, vel, quat)
    cmd_attn_only, _ = QZ.int8_forward(
        CFG, params, ip, frame, vel, quat, quantize_ffn=False
    )
    cmd_f32, _ = M.forward(CFG, params, frame, vel, quat)
    # Ablation lands between full-int8 and float (FFN error removed).
    assert not np.allclose(np.asarray(cmd_attn_only), np.asarray(cmd_full))
    assert bool(jnp.all(jnp.isfinite(cmd_attn_only)))


def test_multilayer_e128_base_config_int8_and_pallas():
    """The reference's 2-layer E=128 base model (tests/tuki.py parity
    target): integer path and Pallas kernel handle it too."""
    cfg = ITA_BASE
    key = jax.random.PRNGKey(5)
    params = M.init_params(cfg, key)
    obs = QZ.QATObservers.init(cfg.num_layers)
    x = 0.5 * jax.random.normal(key, (2, cfg.S, cfg.E))
    attn_fn, ffn_fn, collect = QZ.qat_block_fns(params, obs, cfg.H)
    for i in range(cfg.num_layers):
        attn_fn(i, x)
        ffn_fn(i, x)
    obs = collect()
    ip = QZ.convert_model(params, obs, cfg.H)

    frame = jax.random.uniform(key, (1, 1, 60, 90))
    cmd_int, _ = QZ.int8_forward(
        cfg, params, ip, frame, jnp.ones((1, 1)), jnp.asarray([[1.0, 0, 0, 0]])
    )
    cmd_pal, _ = QZ.pallas_forward(
        cfg, params, ip, frame, jnp.ones((1, 1)), jnp.asarray([[1.0, 0, 0, 0]]),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(cmd_pal), np.asarray(cmd_int), atol=1e-4
    )


def test_aot_export_f32_path_roundtrip(tmp_path, model):
    """f32 artifacts bundle (unused) int params in the traced signature;
    reload must supply them too."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        export_serving_step,
        load_serving_step,
    )

    params, ip = model
    art = tmp_path / "model_f32.jaxexport"
    export_serving_step(art, CFG, params=params, int_params=ip, path="f32")
    step, _, _, meta = load_serving_step(art)
    assert meta["path"] == "f32"
    cmd, st = step(
        jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8), jnp.float32(1.0),
        jnp.float32(5.0), jnp.zeros((4,), jnp.float32), M.zero_state(CFG, 1),
    )
    assert cmd.shape == (3,) and bool(jnp.all(jnp.isfinite(cmd)))


def test_export_test_vectors(tmp_path, model):
    """The export_hwpe analog writes per-stage vectors + manifest that
    reproduce the golden pipeline exactly."""
    from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
    from drone_oa_iree_vit_accelerator_tpu.tools.export_test_vectors import (
        export_vectors,
    )

    params, ip = model
    out = export_vectors(tmp_path, CFG, ip, seed=3)
    assert out.name == "data_S128_E64_P192_F256_H1_B1_Relu"
    blk = np.load(out / "block_0.npz")
    # Replay the attention from the dumped input/weights: must reproduce
    # the dumped stage outputs bit-for-bit.
    x = jnp.asarray(blk["input"], jnp.int8)
    _, stages = II.ita_attention_int8(x, ip["attn"][0], collect_stages=True)
    np.testing.assert_array_equal(np.asarray(stages["Qp_requant"]), blk["Qp_requant"])
    np.testing.assert_array_equal(
        np.asarray(stages["A_partial_softmax"]), blk["A_partial_softmax"]
    )
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["blocks"][0]["quant_params"]["qk"][0] == int(ip["attn"][0].qk_mult)
    assert (out / "block0_A_requant.txt").exists()
