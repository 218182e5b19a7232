"""QAT -> int8 conversion parity, stage by stage.

TPU analog of the reference's verification contract
(tests/export_and_validation_W_B.py, SURVEY.md section 3.5): every stage of
the converted integer pipeline must agree with the fake-quant (QAT)
simulation to <= 1 int8 LSB when fed the same quantized input — the same
"MAE <= 1 per step" criterion, with input injection per stage so errors
don't compound (the reference's --isolate_softmax generalized).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
from drone_oa_iree_vit_accelerator_tpu.ops import quant as Q
from drone_oa_iree_vit_accelerator_tpu.ops.ita_softmax import (
    SOFTMAX_OUT_SCALE,
)
from drone_oa_iree_vit_accelerator_tpu import quant as QZ


def mae(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32))))


@pytest.fixture(scope="module")
def calibrated():
    """Random-init flagship params with observers calibrated on random data."""
    key = jax.random.PRNGKey(42)
    params = M.init_params(CFG, key)
    observers = QZ.QATObservers.init(CFG.num_layers)
    for i in range(8):
        k = jax.random.fold_in(key, i)
        x = 0.5 * jax.random.normal(k, (2, CFG.S, CFG.E))
        _, obs_a = QZ.attention_qat(
            x, params["blocks"][0]["attn"], observers.attn[0], CFG.H
        )
        _, obs_f = QZ.ffn_qat(x, params["blocks"][0]["ffn"], observers.ffn[0])
        observers = QZ.QATObservers(attn=(obs_a,), ffn=(obs_f,))
    int_params = QZ.convert_model(params, observers, CFG.H)
    return params, observers, int_params


def _dq_linear_truth(x_i8, lin: II.QuantLinearParams):
    """Fake-quant float simulation of one int8 linear: dequantized int8
    operands, float matmul + float bias, quantize at the stage scale."""
    x_f = Q.dequantize(x_i8, lin.s_in)
    w_f = Q.dequantize(lin.w, lin.s_w)
    b_f = lin.b.astype(jnp.float32) * (lin.s_in * lin.s_w)
    y_f = x_f @ w_f + b_f
    return Q.quantize(y_f, lin.s_out)


def test_stage_qkv_projections(calibrated):
    _, _, ip = calibrated
    a = ip["attn"][0]
    key = jax.random.PRNGKey(0)
    x_i8 = jax.random.randint(key, (CFG.S, CFG.E), -128, 128, jnp.int8)
    for name, lin in [("Qp", a.q), ("Kp", a.k), ("Vp", a.v)]:
        got = II.int_linear(x_i8, lin)
        truth = _dq_linear_truth(x_i8, lin)
        assert mae(got, truth) <= 1.0, name


def test_stage_qk_matmul(calibrated):
    _, _, ip = calibrated
    a = ip["attn"][0]
    key = jax.random.PRNGKey(1)
    q_i8 = jax.random.randint(key, (CFG.S, CFG.P), -128, 128, jnp.int8)
    k_i8 = jax.random.randint(jax.random.fold_in(key, 1), (CFG.S, CFG.P), -128, 128, jnp.int8)
    acc = jnp.einsum(
        "sd,td->st", q_i8.astype(jnp.int32), k_i8.astype(jnp.int32)
    )
    got = Q.requant(acc, a.qk_mult, a.qk_shift, a.qk_add)
    # Float truth: dequantized matmul at scale s_q*s_k, quantized at s_qk.
    truth = Q.quantize(
        acc.astype(jnp.float32) * float(a.q.s_out) * float(a.k.s_out),
        _qk_scale(a),
    )
    assert mae(got, truth) <= 1.0


def _qk_scale(a: II.IntAttentionParams) -> float:
    # Recover s_qk from the stored effective rescale: eff = s_q*s_k/s_qk.
    eff = float(a.qk_mult) / 2.0 ** float(a.qk_shift)
    return float(a.q.s_out) * float(a.k.s_out) / eff


def test_stage_av_matmul(calibrated):
    _, _, ip = calibrated
    a = ip["attn"][0]
    key = jax.random.PRNGKey(2)
    probs_u8 = jax.random.randint(key, (CFG.S, CFG.S), 0, 256, jnp.int32).astype(jnp.uint8)
    v_i8 = jax.random.randint(jax.random.fold_in(key, 1), (CFG.S, CFG.P), -128, 128, jnp.int8)
    acc = probs_u8.astype(jnp.int32) @ v_i8.astype(jnp.int32)
    got = Q.requant(acc, a.av_mult, a.av_shift, a.av_add)
    eff = float(a.av_mult) / 2.0 ** float(a.av_shift)
    s_av = SOFTMAX_OUT_SCALE * float(a.v.s_out) / eff
    truth = Q.quantize(
        acc.astype(jnp.float32) * SOFTMAX_OUT_SCALE * float(a.v.s_out), s_av
    )
    assert mae(got, truth) <= 1.0


def test_stage_ffn(calibrated):
    _, _, ip = calibrated
    f = ip["ffn"][0]
    key = jax.random.PRNGKey(3)
    x_i8 = jax.random.randint(key, (CFG.S, CFG.E), -128, 128, jnp.int8)
    ff1 = II.int_linear(x_i8, f.fc1)
    truth1 = _dq_linear_truth(x_i8, f.fc1)
    assert mae(ff1, truth1) <= 1.0
    # ReLU bridge.
    relu = Q.requant(
        jnp.maximum(ff1, 0).astype(jnp.int32), f.relu_mult, f.relu_shift, f.relu_add
    )
    eff = float(f.relu_mult) / 2.0 ** float(f.relu_shift)
    s_relu = float(f.fc1.s_out) / eff
    truth_r = Q.quantize(
        jnp.maximum(ff1, 0).astype(jnp.float32) * float(f.fc1.s_out), s_relu
    )
    assert mae(relu, truth_r) <= 1.0
    ff2 = II.int_linear(relu, f.fc2)
    truth2 = _dq_linear_truth(relu, f.fc2)
    assert mae(ff2, truth2) <= 1.0


def test_full_attention_pipeline_vs_fakequant_sim(calibrated):
    """Chained full-block comparison: integer attention vs the QAT
    fake-quant forward in eval mode on the same float input."""
    params, observers, ip = calibrated
    a = ip["attn"][0]
    key = jax.random.PRNGKey(4)
    x = 0.5 * jax.random.normal(key, (1, CFG.S, CFG.E))

    y_int = jax.vmap(lambda s: II.ita_attention_f32(s, a))(x)
    y_fq, _ = QZ.attention_qat(
        x, params["blocks"][0]["attn"], observers.attn[0], CFG.H, update_obs=False
    )
    # Both land on the s_out int8 grid; compare in LSBs of s_out.
    diff_lsb = np.abs(np.asarray(y_int - y_fq)) / float(a.s_out)
    # The dynamic-scale softmax in the QAT sim vs fixed-scale integer
    # softmax is the reference's own train/infer gap; allow a small mean.
    assert diff_lsb.mean() <= 2.0, diff_lsb.mean()


def test_full_model_int8_forward(calibrated):
    params, _, ip = calibrated
    key = jax.random.PRNGKey(5)
    frame = jax.random.uniform(key, (2, 1, 60, 90))
    vel = jnp.ones((2, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))

    attn_fn, ffn_fn = QZ.int8_block_fns(ip)
    cmd_int, _ = M.forward(CFG, params, frame, vel, quat, attn_fn=attn_fn, ffn_fn=ffn_fn)
    cmd_f32, _ = M.forward(CFG, params, frame, vel, quat)
    assert cmd_int.shape == (2, 3)
    assert bool(jnp.all(jnp.isfinite(cmd_int)))
    # Int8 model must stay in the neighborhood of the float model even
    # with uncalibrated-from-training observers (random weights).
    assert float(jnp.max(jnp.abs(cmd_int - cmd_f32))) < 1.0


def test_jit_full_int8_forward(calibrated):
    params, _, ip = calibrated
    attn_fn, ffn_fn = QZ.int8_block_fns(ip)
    step = jax.jit(
        lambda p, f, v, q: M.forward(CFG, p, f, v, q, attn_fn=attn_fn, ffn_fn=ffn_fn)[0]
    )
    cmd = step(
        params,
        jnp.zeros((1, 1, 60, 90)),
        jnp.ones((1, 1)),
        jnp.asarray([[1.0, 0, 0, 0]]),
    )
    assert cmd.shape == (1, 3)
