"""Vitfly whole-model megakernel (ops/pallas/vitfly_model_kernel.py).

Same three-level contract as the flagship megakernel tests
(test_model_kernel.py):

1. kernel (interpret) == pure-jnp mirror of the same math, near-exact;
2. mirror == the composed int8 model path (vitfly_int8_forward +
   postprocess) at float-glue tolerance (the transposed masked-matmul
   conv reformulation + bf16/int8 decoder-LSTM pack are the only
   differences);
3. the transposed attention region is BIT-exact vs the golden
   vitfly_attention_f32 given the same float inputs (both quantize the
   same tensor, so the integer chain is identical end to end);
plus the XLA prefix (transposed im2col patch conv) vs conv2d, the
conv-bias fold, and the serving path='mega' tracking path='pallas'
with threaded LSTM state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
from drone_oa_iree_vit_accelerator_tpu.models.vit_lstm import LSTMState
from drone_oa_iree_vit_accelerator_tpu.ops.integer_ita import (
    vitfly_attention_f32,
)
from drone_oa_iree_vit_accelerator_tpu.ops.pallas import (
    vitfly_model_kernel as MK,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    postprocess_velocity,
)
from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ

VCFG = VF.VITFLY_LSTM


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(5)
    params = VF.init_params(VCFG, key)
    obs = VQ.VitflyObservers.init(VCFG)
    for i in range(3):
        frame = jax.random.uniform(jax.random.fold_in(key, i), (2, 1, 60, 90))
        _, _, obs = VQ.vitfly_qat_forward(
            VCFG, params, obs, frame, jnp.ones((2, 1)),
            jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
        )
    vint = VQ.convert_vitfly_model(params, obs, VCFG)
    kp = MK.make_vitfly_kernel_params(VCFG, params, vint)
    return params, vint, kp


def _rand_inputs(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    frame = jax.random.uniform(ks[0], (1, 1, 60, 90), jnp.float32)
    quat = jax.random.normal(ks[1], (1, 4), jnp.float32) * 0.3
    h = jax.random.normal(ks[2], (3, 1, 128), jnp.float32) * 0.4
    c = jax.random.normal(ks[3], (3, 1, 128), jnp.float32) * 0.4
    return frame, quat, h, c


def test_prefix_matches_conv2d(setup):
    """Transposed im2col stage-1 patch conv == NCHW conv2d, exact."""
    params, _, kp = setup
    frame, _, _, _ = _rand_inputs(0)
    x1t = MK.vitfly_tokens_preln_t(frame, kp.tok, VCFG)
    ref = L.conv2d(
        frame, params["stages"][0]["patch_conv"], stride=4, padding=3
    )[0].reshape(VCFG.stages[0].out_ch, -1)
    np.testing.assert_allclose(x1t, ref, rtol=1e-6, atol=1e-6)


def test_kernel_matches_jnp_mirror(setup):
    """Interpret-mode kernel == pure-jnp mirror, near-exact."""
    _, _, kp = setup
    frame, quat, h, c = _rand_inputs(1)
    x1t = MK.vitfly_tokens_preln_t(frame, kp.tok, VCFG)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)
    cmd_k, h_k, c_k = MK.vitfly_fused_step(
        kp, x1t, vel, pos_x, quat, h, c, interpret=True
    )
    cmd_r, h_r, c_r = MK.vitfly_megakernel_reference(
        kp, x1t, vel, pos_x, quat, h, c
    )
    np.testing.assert_allclose(cmd_k, cmd_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(h_k, h_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(c_k, c_r, rtol=1e-4, atol=1e-4)


def test_mirror_matches_composed_path(setup):
    """Mirror == vitfly_int8_forward + postprocess at glue tolerance."""
    params, vint, kp = setup
    frame, quat, h, c = _rand_inputs(2)
    vel, pos_x = jnp.float32(5.0), jnp.float32(3.0)
    cmd_comp, st2 = VQ.vitfly_int8_forward(
        VCFG, params, vint, frame, vel.reshape(1, 1), quat, LSTMState(h, c)
    )
    cmd_pp = postprocess_velocity(cmd_comp[0], vel, pos_x)
    x1t = MK.vitfly_tokens_preln_t(frame, kp.tok, VCFG)
    cmd_r, h_r, c_r = MK.vitfly_megakernel_reference(
        kp, x1t, vel, pos_x, quat, h, c
    )
    np.testing.assert_allclose(cmd_r, cmd_pp, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(h_r, st2.h, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(c_r, st2.c, rtol=0.08, atol=0.08)


@pytest.mark.parametrize("si", [0, 1])
def test_attention_region_bit_exact(setup, si):
    """The transposed attention math == golden vitfly_attention_f32,
    EXACT, on both stage shapes (H=1 and H=2): identical float input ->
    identical int8 quantization -> identical integer chain."""
    _, vint, kp = setup
    st = MK._static_from_cfg(VCFG)[0]
    hw = st.hw1 if si == 0 else st.hw2
    c = VCFG.stages[si].out_ch
    r = VCFG.stages[si].reduction
    m = ((hw[0] - r) // r + 1) * ((hw[1] - r) // r + 1)
    heads = VCFG.stages[si].heads
    for li in range(2):
        bi = si * 2 + li
        key = jax.random.PRNGKey(100 + bi)
        xt = jax.random.normal(key, (c, hw[0] * hw[1])) * 2.0
        redt = jax.random.normal(jax.random.fold_in(key, 1), (c, m)) * 2.0
        wint = getattr(kp, f"wint{si + 1}")[li]
        ibias = getattr(kp, f"ibias{si + 1}")[li]
        out_t = MK._attn_block_t(
            xt, redt, wint, ibias, kp.iscal, kp.fscalb, bi, heads
        )
        ref = vitfly_attention_f32(xt.T, redt.T, vint["attn"][si][li])
        np.testing.assert_array_equal(np.asarray(out_t.T), np.asarray(ref))


def test_conv_bias_fold_exact(setup):
    """Fusion conv bias folded through the decoder: on zero fusion
    input only the bias path flows."""
    params, _, kp = setup
    fcb = params["fusion_conv"]["b"]
    dec = params["decoder"]
    w_sn = L.spectral_norm_weight(dec["w"], dec["u"], dec["v"])[0]
    flat = jnp.tile(fcb[:, None], (1, 384)).reshape(1, -1)
    dec_ref = flat @ w_sn + dec["b"]
    np.testing.assert_allclose(kp.bdec, dec_ref, rtol=2e-4, atol=2e-4)


def test_mega_serving_step_matches_pallas_path(setup):
    """path='mega' tracks path='pallas' over frames with threaded
    state (same contract as the flagship mega serving test)."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_vitfly_serving_step,
    )

    params, vint, kp = setup
    step_mega = make_vitfly_serving_step(VCFG, "mega")
    step_pallas = make_vitfly_serving_step(VCFG, "pallas")
    st_m = LSTMState(jnp.zeros((3, 1, 128)), jnp.zeros((3, 1, 128)))
    st_p = LSTMState(jnp.zeros((3, 1, 128)), jnp.zeros((3, 1, 128)))
    vel, quat = jnp.float32(5.0), jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    for i in range(3):
        img = jax.random.randint(
            jax.random.PRNGKey(20 + i), (60, 90), 0, 256, jnp.uint8
        )
        pos_x = jnp.float32(1.0 + 2.0 * i)
        cmd_m, st_m = step_mega(kp, None, img, vel, pos_x, quat, st_m)
        cmd_p, st_p = step_pallas(params, vint, img, vel, pos_x, quat, st_p)
        np.testing.assert_allclose(cmd_m, cmd_p, rtol=0.05, atol=0.08)
