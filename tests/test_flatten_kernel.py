"""FLATTEN-variant megakernel (ops/pallas/flatten_kernel.py) verification.

Same three-level contract as the flagship megakernel tests
(test_model_kernel.py): interpret-kernel == jnp mirror; mirror == the
composed model tail at int8/bf16-glue tolerance; the serving step
(path='mega') == the per-layer pallas serving step per frame with
recurrent state threaded. Parameterized over the FLATTEN zoo configs —
the base 2-layer E=128 model is the reference's second deployed shape
(reference tests/tuki.py:422).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core.config import MODEL_ZOO
from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.flatten_kernel import (
    flatten_fused_step,
    flatten_reference,
    make_flatten_kernel_params,
)
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
    ita_encoder_block,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    make_serving_step,
    postprocess_velocity,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq

FLATTEN_CFGS = ["ITA", "ITA_single_layer"]  # E=128 L=2 and E=64 L=1 shapes
# (ITA_upsample_shuffle shares the ITA dims exactly — covered by "ITA".)


@pytest.fixture(scope="module", params=FLATTEN_CFGS)
def setup(request):
    cfg = MODEL_ZOO[request.param]
    key = jax.random.PRNGKey(7)
    params = M.init_params(cfg, key)
    frames = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = calibrate_ptq(cfg, params, frames)
    kp = make_flatten_kernel_params(cfg, params, int_params)
    return cfg, params, int_params, kp


def _rand_inputs(cfg, seed):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    tokens = jax.random.normal(ks[0], (cfg.S, cfg.E), jnp.float32)  # pre-LN
    quat = jax.random.normal(ks[1], (1, 4), jnp.float32) * 0.3
    h = jax.random.normal(ks[2], (3, 1, 128), jnp.float32) * 0.5
    c = jax.random.normal(ks[3], (3, 1, 128), jnp.float32) * 0.5
    return tokens, quat, h, c


def _encoder_out(cfg, params, int_params, kp, tokens_preln):
    """LN (as the kernel does) + golden encoder layers -> (S, E)."""
    x = L.layer_norm(
        tokens_preln[None], {"g": kp.tokg[0], "b": kp.tokb[0]}
    )
    for i in range(cfg.num_layers):
        blk = params["blocks"][i]
        x = ita_encoder_block(
            x, int_params["attn"][i], int_params["ffn"][i],
            blk["ln1"], blk["ln2"], interpret=True,
        )
    return x[0]


def test_kernel_matches_jnp_mirror(setup):
    cfg, params, int_params, kp = setup
    tokens, quat, h, c = _rand_inputs(cfg, 0)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)

    cmd_k, h_k, c_k = flatten_fused_step(
        kp, tokens, vel, pos_x, quat, h, c,
        num_layers=cfg.num_layers, heads=cfg.H, interpret=True,
    )
    x_enc = _encoder_out(cfg, params, int_params, kp, tokens)
    cmd_r, h_r, c_r = flatten_reference(kp, x_enc, vel, pos_x, quat, h, c)
    np.testing.assert_allclose(cmd_k, cmd_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(h_k, h_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(c_k, c_r, rtol=1e-4, atol=1e-4)


def test_mirror_matches_composed_path(setup):
    """Mirror decoder/LSTM == composed f32 model tail at int8-glue
    tolerance (per-output-column weight quantization is the only
    difference)."""
    cfg, params, int_params, kp = setup
    tokens, quat, h, c = _rand_inputs(cfg, 1)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)

    x_enc = _encoder_out(cfg, params, int_params, kp, tokens)[None]
    fparams = M.freeze_for_inference(cfg, params)
    flat = M.fuse_tokens(cfg, fparams, x_enc)  # (1, S*E)
    out = flat @ fparams["decoder"]["w"] + fparams["decoder"]["b"]
    extra = jnp.concatenate([(vel / 10.0).reshape(1, 1), quat], axis=1)
    feat = jnp.concatenate([out, extra], axis=1)
    y, (h2, c2) = L.lstm_forward(feat, M.LSTMState(h, c), fparams["lstm"], 0.0, None)
    cmd = y @ fparams["fc2"]["w"] + fparams["fc2"]["b"]
    cmd_pp = postprocess_velocity(cmd[0], vel, pos_x)

    cmd_r, h_r, c_r = flatten_reference(
        kp, x_enc[0], vel, pos_x, quat, h, c
    )
    np.testing.assert_allclose(cmd_r, cmd_pp, rtol=0.06, atol=0.06)
    np.testing.assert_allclose(h_r, h2, rtol=0.06, atol=0.06)
    np.testing.assert_allclose(c_r, c2, rtol=0.08, atol=0.08)


def test_serving_step_mega_matches_pallas(setup):
    """path='mega' == path='pallas' per frame at command tolerance,
    recurrent state threaded across 3 frames."""
    cfg, params, int_params, kp = setup
    step_mega = make_serving_step(cfg, "mega")
    step_pallas = make_serving_step(cfg, "pallas")

    st_m = M.zero_state(cfg, 1)
    st_p = M.zero_state(cfg, 1)
    for t in range(3):
        img = jax.random.randint(
            jax.random.PRNGKey(100 + t), (60, 90), 0, 256, jnp.uint8
        )
        vel = jnp.float32(4.0)
        pos_x = jnp.float32(1.0 + 2.0 * t)
        quat = jnp.asarray([0.9, 0.1, 0.2, 0.3], jnp.float32)
        cmd_m, st_m = step_mega(kp, None, img, vel, pos_x, quat, st_m)
        cmd_p, st_p = step_pallas(
            params, int_params, img, vel, pos_x, quat, st_p
        )
        np.testing.assert_allclose(
            np.asarray(cmd_m), np.asarray(cmd_p), rtol=0.08, atol=0.05
        )
    np.testing.assert_allclose(
        np.asarray(st_m.h), np.asarray(st_p.h), rtol=0.1, atol=0.05
    )


def test_engine_auto_routes_flatten_to_mega(setup):
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import ServingEngine

    cfg, params, int_params, _ = setup
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.flatten_kernel import (
        FlattenKernelParams,
    )

    eng = ServingEngine(cfg, params=params, int_params=int_params,
                        path="auto")
    assert isinstance(eng.params, FlattenKernelParams)
