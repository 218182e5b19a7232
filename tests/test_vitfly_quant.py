"""Quantized vitfly path: stage-wise parity + full-model integration.

The vitfly analog of tests/test_qat_convert.py — the reference's alt
export path carries MultiheadITAWithRequant, a float EMULATION of the
ITA requant pipeline over the 2-stage ITALSTM (reference
scripts/export_model.py:119-162, 261-283); here the pipeline is real
integer arithmetic (ops/integer_ita.vitfly_attention_int8) and every
stage must agree with the fake-quant QAT simulation to <= 1 int8 LSB
(the reference's MAE <= 1 criterion, export_and_validation_W_B.py:324).
Stage 2 exercises H=2 multi-head + cross-attention (Nq=96, Nkv=6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
from drone_oa_iree_vit_accelerator_tpu.models.vit_lstm import LSTMState
from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
from drone_oa_iree_vit_accelerator_tpu.ops import quant as Q
from drone_oa_iree_vit_accelerator_tpu.ops.ita_softmax import SOFTMAX_OUT_SCALE
from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ

CFG = VF.VITFLY_LSTM


def mae(a, b):
    return float(
        np.mean(np.abs(np.asarray(a, np.int32) - np.asarray(b, np.int32)))
    )


@pytest.fixture(scope="module")
def calibrated():
    """Random-init vitfly params, observers calibrated on random frames."""
    key = jax.random.PRNGKey(3)
    params = VF.init_params(CFG, key)
    observers = VQ.VitflyObservers.init(CFG)
    for i in range(6):
        k = jax.random.fold_in(key, i)
        frame = jax.random.uniform(k, (2, 1, 60, 90))
        vel = jnp.ones((2, 1))
        quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        _, _, observers = VQ.vitfly_qat_forward(
            CFG, params, observers, frame, vel, quat
        )
    vint = VQ.convert_vitfly_model(params, observers, CFG)
    return params, observers, vint


def _dq_linear_truth(x_i8, lin):
    x_f = Q.dequantize(x_i8, lin.s_in)
    w_f = Q.dequantize(lin.w, lin.s_w)
    b_f = lin.b.astype(jnp.float32) * (lin.s_in * lin.s_w)
    return Q.quantize(x_f @ w_f + b_f, lin.s_out)


@pytest.mark.parametrize("si,li", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_stage_projections(calibrated, si, li):
    """Q (from full tokens) and K/V (from the reduced copy): integer
    linear vs dequantized-float truth, <= 1 LSB. Covers both stages'
    shapes (C=32 H=1 and C=64 H=2)."""
    _, _, vint = calibrated
    a = vint["attn"][si][li]
    c = CFG.stages[si].out_ch
    key = jax.random.PRNGKey(10 * si + li)
    xq = jax.random.randint(key, (17, c), -128, 128, jnp.int8)
    xkv = jax.random.randint(
        jax.random.fold_in(key, 1), (6, c), -128, 128, jnp.int8
    )
    for name, lin, x in [("Qp", a.q, xq), ("Kp", a.k, xkv), ("Vp", a.v, xkv)]:
        got = II.int_linear(x, lin)
        assert mae(got, _dq_linear_truth(x, lin)) <= 1.0, (name, si, li)


def test_stage_qk_av_final(calibrated):
    """The matmul requants + the mf/sf final requant (stage 2, H=2)."""
    _, _, vint = calibrated
    a = vint["attn"][1][0]
    key = jax.random.PRNGKey(5)
    q_i8 = jax.random.randint(key, (2, 96, 32), -128, 128, jnp.int8)
    k_i8 = jax.random.randint(
        jax.random.fold_in(key, 1), (2, 6, 32), -128, 128, jnp.int8
    )
    acc = jnp.einsum(
        "hsd,htd->hst", q_i8.astype(jnp.int32), k_i8.astype(jnp.int32)
    )
    got = Q.requant(acc, a.qk_mult, a.qk_shift, a.qk_add)
    eff = float(a.qk_mult) / 2.0 ** float(a.qk_shift)
    s_qk = float(a.q.s_out) * float(a.k.s_out) / eff
    truth = Q.quantize(
        acc.astype(jnp.float32) * float(a.q.s_out) * float(a.k.s_out), s_qk
    )
    assert mae(got, truth) <= 1.0

    probs = jax.random.randint(
        jax.random.fold_in(key, 2), (2, 96, 6), 0, 256, jnp.int32
    )
    v_i8 = jax.random.randint(
        jax.random.fold_in(key, 3), (2, 6, 32), -128, 128, jnp.int8
    )
    av = jnp.einsum("hst,htd->hsd", probs, v_i8.astype(jnp.int32))
    got_av = Q.requant(av, a.av_mult, a.av_shift, a.av_add)
    eff_av = float(a.av_mult) / 2.0 ** float(a.av_shift)
    s_av = SOFTMAX_OUT_SCALE * float(a.v.s_out) / eff_av
    truth_av = Q.quantize(
        av.astype(jnp.float32) * SOFTMAX_OUT_SCALE * float(a.v.s_out), s_av
    )
    assert mae(got_av, truth_av) <= 1.0

    # Final requant (mf/sf): int8 grid s_o_out -> s_final.
    out_i8 = jax.random.randint(
        jax.random.fold_in(key, 4), (96, 64), -128, 128, jnp.int8
    )
    got_f = Q.requant(
        out_i8.astype(jnp.int32), a.final_mult, a.final_shift, a.final_add
    )
    eff_f = float(a.final_mult) / 2.0 ** float(a.final_shift)
    s_final = float(a.o.s_out) / eff_f
    truth_f = Q.quantize(
        out_i8.astype(jnp.float32) * float(a.o.s_out), s_final
    )
    assert mae(got_f, truth_f) <= 1.0


@pytest.mark.parametrize("si,li", [(0, 0), (1, 1)])
def test_full_attention_block_vs_fakequant(calibrated, si, li):
    """Chained block comparison: integer cross-attention vs the QAT
    fake-quant forward on the same float inputs (per-stage dims)."""
    params, observers, vint = calibrated
    a = vint["attn"][si][li]
    sc = CFG.stages[si]
    nq = {0: 345, 1: 96}[si]
    nkv = {0: 2, 1: 6}[si]
    key = jax.random.PRNGKey(30 + si)
    xq = 0.5 * jax.random.normal(key, (1, nq, sc.out_ch))
    xkv = 0.5 * jax.random.normal(
        jax.random.fold_in(key, 1), (1, nkv, sc.out_ch)
    )
    y_int = jax.vmap(lambda q, kv: II.vitfly_attention_f32(q, kv, a))(
        xq, xkv
    )
    y_fq, _ = VQ.vitfly_attention_qat(
        xq, xkv, params["stages"][si]["layers"][li]["attn"],
        observers.attn[si][li], sc.heads, update_obs=False,
    )
    diff_lsb = np.abs(np.asarray(y_int - y_fq)) / float(a.s_out)
    # Chained (non-injected) comparison: errors compound through 8
    # stages. The hardware criterion stays the per-stage MAE <= 1 above
    # (reference export_and_validation_W_B.py:324); the chained bound is
    # looser than the ITA-family 2.0 because (a) this block has one MORE
    # requant stage (mf/sf) and (b) the dynamic-scale softmax sim vs the
    # fixed-scale integer softmax (the reference's own train/infer gap)
    # is coarser over Nkv=6 keys than over S=128.
    assert diff_lsb.mean() <= 3.5, diff_lsb.mean()


def test_stage_collection_names(calibrated):
    """The integer pipeline exposes the PyITA-style stage dict (+ the
    vitfly-only Final_requant) for the verification tooling."""
    _, _, vint = calibrated
    a = vint["attn"][1][0]
    key = jax.random.PRNGKey(6)
    q_i8 = jax.random.randint(key, (96, 64), -128, 128, jnp.int8)
    kv_i8 = jax.random.randint(
        jax.random.fold_in(key, 1), (6, 64), -128, 128, jnp.int8
    )
    out, stages = II.vitfly_attention_int8(
        q_i8, kv_i8, a, collect_stages=True
    )
    assert set(stages) == {
        "Qp_requant", "Kp_requant", "Vp_requant", "A_requant",
        "A_partial_softmax", "O_soft_requant", "Out_soft_requant",
        "Final_requant",
    }
    np.testing.assert_array_equal(
        np.asarray(stages["Final_requant"]), np.asarray(out)
    )
    assert stages["A_partial_softmax"].shape == (2, 96, 6)  # H=2 heads


def test_full_model_int8_forward(calibrated):
    params, _, vint = calibrated
    key = jax.random.PRNGKey(7)
    frame = jax.random.uniform(key, (2, 1, 60, 90))
    vel = jnp.ones((2, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))

    cmd_int, st = VQ.vitfly_int8_forward(
        CFG, params, vint, frame, vel, quat
    )
    cmd_f32, _ = VF.forward(CFG, params, frame, vel, quat)
    assert cmd_int.shape == (2, 3)
    assert isinstance(st, LSTMState)
    assert bool(jnp.all(jnp.isfinite(cmd_int)))
    # The quantized model REPLACES EfficientSelfAttention (scaled, softmax
    # over reduced tokens) with the ITA pipeline (unscaled) exactly like
    # the reference export — with calibrated observers the command must
    # stay in the float model's neighborhood.
    assert float(jnp.max(jnp.abs(cmd_int - cmd_f32))) < 2.0


def test_jit_full_int8_forward(calibrated):
    params, _, vint = calibrated
    step = jax.jit(
        lambda p, vp, f, v, q: VQ.vitfly_int8_forward(CFG, p, vp, f, v, q)[0]
    )
    cmd = step(
        params, vint,
        jnp.zeros((1, 1, 60, 90)), jnp.ones((1, 1)),
        jnp.asarray([[1.0, 0, 0, 0]]),
    )
    assert cmd.shape == (1, 3)


def test_qat_forward_trains(calibrated):
    """Gradients flow through the fake-quant vitfly forward (surrogate
    softmax gradient + STE) — the QAT fine-tune path is trainable."""
    params, observers, _ = calibrated
    frame = jnp.ones((1, 1, 60, 90)) * 0.5
    vel = jnp.ones((1, 1))
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    target = jnp.asarray([[1.0, 0.2, -0.1]])

    def loss(p):
        cmd, _, _ = VQ.vitfly_qat_forward(
            CFG, p, observers, frame, vel, quat, update_obs=False
        )
        return jnp.mean((cmd - target) ** 2)

    g = jax.grad(loss)(params)
    gq = g["stages"][1]["layers"][0]["attn"]["q"]["w"]
    assert float(jnp.max(jnp.abs(gq))) > 0.0
    gkv = g["stages"][0]["layers"][0]["attn"]["kv"]["w"]
    assert float(jnp.max(jnp.abs(gkv))) > 0.0
