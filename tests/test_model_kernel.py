"""Whole-model megakernel (ops/pallas/model_kernel.py) verification.

Three-level contract, mirroring the encoder-kernel discipline:

1. kernel (interpret) == pure-jnp mirror of the same math, near-exact
   (isolates Mosaic-lowering bugs from math-design bugs);
2. the mirror == the composed model path (ita_encoder_block +
   fuse_tokens_nhwc + decoder + lstm + postprocess) at bf16-glue
   tolerance (isolates the deliberate bf16 demotion);
3. the serving step (path='mega') == the pallas serving step per frame
   at command tolerance, recurrent state threaded;
4. the folded constants (conv bias through the decoder) in isolation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core.config import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
    ita_encoder_block,
)
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.model_kernel import (
    flagship_fused_step,
    make_flagship_kernel_params,
    megakernel_reference,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    make_serving_step,
    postprocess_velocity,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    params = M.init_params(CFG, key)
    frames = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = calibrate_ptq(CFG, params, frames)
    kp = make_flagship_kernel_params(CFG, params, int_params)
    return params, int_params, kp


def _rand_inputs(seed):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    tokens = jax.random.normal(ks[0], (CFG.S, CFG.E), jnp.float32)  # pre-LN
    quat = jax.random.normal(ks[1], (1, 4), jnp.float32) * 0.3
    h = jax.random.normal(ks[2], (3, 1, 128), jnp.float32) * 0.5
    c = jax.random.normal(ks[3], (3, 1, 128), jnp.float32) * 0.5
    return tokens, quat, h, c


def _encoder_out(params, int_params, kp, tokens_preln):
    """LN (as the kernel does) + golden encoder block -> (1, S, E)."""
    tokens_ln = L.layer_norm(
        tokens_preln[None], {"g": kp.tokg[0], "b": kp.tokb[0]}
    )
    blk = params["blocks"][0]
    return ita_encoder_block(
        tokens_ln, int_params["attn"][0], int_params["ffn"][0],
        blk["ln1"], blk["ln2"], interpret=True,
    )


def test_kernel_matches_jnp_mirror(setup):
    """Interpret-mode kernel == pure-jnp mirror (same math, no Pallas)."""
    params, int_params, kp = setup
    tokens, quat, h, c = _rand_inputs(0)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)

    cmd_k, h_k, c_k = flagship_fused_step(
        kp, tokens, vel, pos_x, quat, h, c, interpret=True
    )
    # The mirror starts at the ENCODER OUTPUT (integer region verified
    # separately); feed it the golden encoder result on the same tokens.
    x_enc = _encoder_out(params, int_params, kp, tokens)
    cmd_r, h_r, c_r = megakernel_reference(kp, x_enc[0], vel, pos_x, quat, h, c)
    np.testing.assert_allclose(cmd_k, cmd_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(h_k, h_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(c_k, c_r, rtol=1e-4, atol=1e-4)


def test_preln_plus_ln_is_tokenizer(setup):
    """The XLA prefix (tokenizer_preln_nhwc) + kernel LN == the full
    tokenizer_forward_nhwc."""
    params, _, kp = setup
    key = jax.random.PRNGKey(3)
    frame = jax.random.uniform(key, (1, 1, 60, 90), jnp.float32)
    tokens_ref = L.tokenizer_forward_nhwc(frame, params["tokenizer"], CFG)
    pre = L.tokenizer_preln_nhwc(frame, params["tokenizer"], CFG)
    tokens_kernel = L.layer_norm(pre, {"g": kp.tokg[0], "b": kp.tokb[0]})
    np.testing.assert_allclose(tokens_kernel, tokens_ref, rtol=1e-5, atol=1e-6)


def test_mirror_matches_composed_path(setup):
    """Mirror fusion/decoder/LSTM == the composed f32 model tail at
    bf16-glue tolerance (the deliberate weight demotion is the only
    difference)."""
    params, int_params, kp = setup
    tokens, quat, h, c = _rand_inputs(1)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)

    x_enc = _encoder_out(params, int_params, kp, tokens)
    fparams = M.freeze_for_inference(CFG, params)
    flat = M.fuse_tokens_nhwc(CFG, fparams, x_enc)
    out = flat @ fparams["decoder"]["w"] + fparams["decoder"]["b"]
    extra = jnp.concatenate([(vel / 10.0).reshape(1, 1), quat], axis=1)
    feat = jnp.concatenate([out, extra], axis=1)
    state = M.LSTMState(h, c)
    y, (h2, c2) = L.lstm_forward(feat, state, fparams["lstm"], 0.0, None)
    cmd = y @ fparams["fc2"]["w"] + fparams["fc2"]["b"]
    cmd_pp = postprocess_velocity(cmd[0], vel, pos_x)

    cmd_r, h_r, c_r = megakernel_reference(
        kp, x_enc[0], vel, pos_x, quat, h, c
    )
    np.testing.assert_allclose(cmd_r, cmd_pp, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(h_r, h2, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(c_r, c2, rtol=0.08, atol=0.08)


def test_mega_serving_step_matches_pallas_path(setup):
    """path='mega' serving step tracks path='pallas' over a frame
    sequence with threaded LSTM state."""
    params, int_params, kp = setup
    fparams = M.freeze_for_inference(CFG, params)
    step_mega = make_serving_step(CFG, "mega")
    step_pallas = make_serving_step(CFG, "pallas")

    st_m = M.zero_state(CFG, 1)
    st_p = M.zero_state(CFG, 1)
    vel, quat = jnp.float32(5.0), jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    for i in range(4):
        img = jax.random.randint(
            jax.random.PRNGKey(10 + i), (60, 90), 0, 256, jnp.uint8
        )
        pos_x = jnp.float32(1.0 + 2.0 * i)
        cmd_m, st_m = step_mega(kp, None, img, vel, pos_x, quat, st_m)
        cmd_p, st_p = step_pallas(
            fparams, int_params, img, vel, pos_x, quat, st_p
        )
        np.testing.assert_allclose(cmd_m, cmd_p, rtol=0.05, atol=0.08)


def test_conv_bias_fold_exact(setup):
    """The conv bias folded through the decoder equals running the conv
    with its bias: on zero tokens only the bias path flows."""
    params, int_params, kp = setup
    fparams = M.freeze_for_inference(CFG, params)
    zero_tokens = jnp.zeros((1, CFG.S, CFG.E))
    flat = M.fuse_tokens_nhwc(CFG, fparams, zero_tokens)
    dec_ref = flat @ fparams["decoder"]["w"] + fparams["decoder"]["b"]
    np.testing.assert_allclose(kp.bdec[0], dec_ref[0], rtol=2e-2, atol=2e-2)


def test_streaming_softmax_mode(setup):
    """softmax_mode='streaming' (the hardware's partial softmax) is a
    selectable megakernel mode and matches the pallas path in the same
    mode."""
    params, int_params, kp = setup
    tokens, quat, h, c = _rand_inputs(4)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)
    cmd_s, _, _ = flagship_fused_step(
        kp, tokens, vel, pos_x, quat, h, c, interpret=True,
        softmax_mode="streaming",
    )
    blk = params["blocks"][0]
    tokens_ln = L.layer_norm(
        tokens[None], {"g": kp.tokg[0], "b": kp.tokb[0]}
    )
    x_enc = ita_encoder_block(
        tokens_ln, int_params["attn"][0], int_params["ffn"][0],
        blk["ln1"], blk["ln2"], interpret=True, softmax_mode="streaming",
    )
    cmd_r, _, _ = megakernel_reference(kp, x_enc[0], vel, pos_x, quat, h, c)
    np.testing.assert_allclose(cmd_s, cmd_r, rtol=1e-4, atol=1e-4)


def test_tokenizer_kron_path_matches_two_stage():
    """The large-batch kron resize equals the two-stage einsum resize."""
    key = jax.random.PRNGKey(11)
    params = M.init_params(CFG, key)
    frames = jax.random.uniform(key, (64, 1, 60, 90), jnp.float32)
    big = L.tokenizer_preln_nhwc(frames, params["tokenizer"], CFG)
    small = jnp.concatenate([
        L.tokenizer_preln_nhwc(frames[i : i + 16], params["tokenizer"], CFG)
        for i in range(0, 64, 16)
    ])
    np.testing.assert_allclose(big, small, rtol=1e-4, atol=1e-5)


def test_mega_aot_roundtrip(tmp_path, setup):
    """The megakernel serving step exports via jax.export (kernel-operand
    pytree bundled) and reloads into a working step."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.aot import (
        export_serving_step,
        load_serving_step,
    )

    params, int_params, kp = setup
    art = export_serving_step(
        tmp_path / "mega.jaxexport", CFG, params=params,
        int_params=int_params, path="mega",
    )
    step, loaded_kp, _, meta = load_serving_step(art)
    assert meta["path"] == "mega"
    img = jax.random.randint(jax.random.PRNGKey(0), (60, 90), 0, 256, jnp.uint8)
    vel, quat = jnp.float32(5.0), jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    cmd_aot, _ = step(img, vel, jnp.float32(3.0), quat, M.zero_state(CFG, 1))
    live = make_serving_step(CFG, "mega")
    cmd_live, _ = live(kp, None, img, vel, jnp.float32(3.0), quat,
                       M.zero_state(CFG, 1))
    np.testing.assert_allclose(cmd_aot, cmd_live, rtol=1e-6, atol=1e-6)
