"""Zoo-wide stage parity: every MODEL_ZOO config, every layer, every
pipeline stage, against the NumPy oracle — with REAL chained inputs.

This is the tuki.py analog (reference tests/tuki.py:24-479 verifies the
base 2-layer E=128 model separately from the flagship, deriving each
block's ground-truth inputs from its NEIGHBORS' hook captures): here
block k's Q/K/V input is the real int8 quantization of block k-1's real
output (integer attention + float LN glue actually executed), so
multi-layer error chaining is exercised — not per-stage injection alone.

Criterion: bit-exact equality per stage (our golden path and the oracle
implement the same integer spec; the reference's MAE <= 1 bar is the
loose version for its torch-vs-PyITA float-boundary gap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ita_oracle as oracle
from drone_oa_iree_vit_accelerator_tpu.core.config import MODEL_ZOO
from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
from drone_oa_iree_vit_accelerator_tpu.ops import quant as Q
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq

ATTN_STAGES = (
    "Qp_requant", "Kp_requant", "Vp_requant", "A_requant",
    "A_partial_softmax", "O_soft_requant", "Out_soft_requant",
)
FFN_STAGES = ("FFp_requant", "FF2p_requant")


def _qp_dict(a: II.IntAttentionParams, f: II.IntFFNParams) -> dict:
    """IntAttention/IntFFN params -> the oracle's PyITA-style
    quant_params naming (reference translate_torch_scales_to_hw_params)."""
    def st(mult, shift):
        return {"mult": int(mult), "shift": int(shift), "add": 0}

    return {
        "q_proj": st(a.q.mult, a.q.shift),
        "k_proj": st(a.k.mult, a.k.shift),
        "v_proj": st(a.v.mult, a.v.shift),
        "qk_matmul": st(a.qk_mult, a.qk_shift),
        "av_matmul": st(a.av_mult, a.av_shift),
        "out_proj": st(a.o.mult, a.o.shift),
        "fc1": st(f.fc1.mult, f.fc1.shift),
        "relu": st(f.relu_mult, f.relu_shift),
        "fc2": st(f.fc2.mult, f.fc2.shift),
    }


@pytest.fixture(scope="module", params=sorted(MODEL_ZOO))
def zoo(request):
    cfg = MODEL_ZOO[request.param]
    key = jax.random.PRNGKey(17)
    params = M.init_params(cfg, key)
    frames = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = calibrate_ptq(cfg, params, frames)
    # One REAL frame through the real tokenizer: the chained layer inputs
    # below are actual model activations, not synthetic injections.
    frame = (
        jax.random.randint(
            jax.random.fold_in(key, 1), (1, 1, 60, 90), 0, 256, jnp.uint8
        ).astype(jnp.float32)
        / 255.0
    )
    tokens = L.tokenizer_forward(frame, params["tokenizer"], cfg)  # (1,S,E)
    return cfg, params, int_params, tokens


def test_every_layer_every_stage_oracle_exact(zoo):
    cfg, params, ip, tokens = zoo
    x = tokens[0]  # (S, E) float
    for i in range(cfg.num_layers):
        a, f = ip["attn"][i], ip["ffn"][i]
        blk = params["blocks"][i]

        # ---- attention block on the REAL (chained) input ----
        x_i8 = Q.quantize(x, a.s_in)
        out_i8, stages = II.ita_attention_int8(x_i8, a, collect_stages=True)

        # FFN input: the actual residual+LN glue output, quantized.
        attn_f = Q.dequantize(out_i8, a.s_out)
        h = L.layer_norm(x[None] + attn_f[None], blk["ln1"])[0]
        h_i8 = Q.quantize(h, f.s_in)
        ff_out, fstages = II.ita_ffn_int8(h_i8, f, collect_stages=True)

        sim = oracle.Transformer(
            cfg.S, cfg.P, cfg.E, cfg.F, H=cfg.H,
            Q=np.asarray(x_i8), K=np.asarray(x_i8), V=np.asarray(x_i8),
            FF_in=np.asarray(h_i8),
            Wq=np.asarray(a.q.w), Wk=np.asarray(a.k.w),
            Wv=np.asarray(a.v.w), Wo=np.asarray(a.o.w),
            Wff=np.asarray(f.fc1.w), Wff2=np.asarray(f.fc2.w),
            Bq=np.asarray(a.q.b), Bk=np.asarray(a.k.b),
            Bv=np.asarray(a.v.b), Bo=np.asarray(a.o.b),
            Bff=np.asarray(f.fc1.b), Bff2=np.asarray(f.fc2.b),
            quant_params=_qp_dict(a, f),
            no_partial_softmax=True,  # golden default mode is onepass
        )
        sim.run_attention()
        sim.feedforward_layer()

        for name in ATTN_STAGES:
            ours = np.asarray(stages[name])
            truth = np.asarray(getattr(sim, name)).reshape(ours.shape)
            np.testing.assert_array_equal(
                ours, truth, err_msg=f"{cfg.name} layer {i} {name}"
            )
        for name in FFN_STAGES:
            np.testing.assert_array_equal(
                np.asarray(fstages[name]), np.asarray(getattr(sim, name)),
                err_msg=f"{cfg.name} layer {i} {name}",
            )

        # Advance the chain with the real float glue for the next layer.
        x = L.layer_norm(
            h[None] + Q.dequantize(ff_out, f.s_out)[None], blk["ln2"]
        )[0]


def test_streaming_mode_every_config(zoo):
    """Same chained contract for the hardware-default streaming softmax
    (PyITA's partial mode; reference export_and_validation_W_B.py:527)."""
    cfg, params, ip, tokens = zoo
    x_i8 = Q.quantize(tokens[0], ip["attn"][0].s_in)
    a, f = ip["attn"][0], ip["ffn"][0]
    out_i8, stages = II.ita_attention_int8(
        x_i8, a, collect_stages=True, softmax_mode="streaming"
    )
    sim = oracle.Transformer(
        cfg.S, cfg.P, cfg.E, cfg.F, H=cfg.H,
        Q=np.asarray(x_i8), K=np.asarray(x_i8), V=np.asarray(x_i8),
        FF_in=np.asarray(x_i8),
        Wq=np.asarray(a.q.w), Wk=np.asarray(a.k.w),
        Wv=np.asarray(a.v.w), Wo=np.asarray(a.o.w),
        Wff=np.asarray(f.fc1.w), Wff2=np.asarray(f.fc2.w),
        Bq=np.asarray(a.q.b), Bk=np.asarray(a.k.b),
        Bv=np.asarray(a.v.b), Bo=np.asarray(a.o.b),
        Bff=np.asarray(f.fc1.b), Bff2=np.asarray(f.fc2.b),
        quant_params=_qp_dict(a, f),
        no_partial_softmax=False,
    )
    sim.run_attention()
    np.testing.assert_array_equal(
        np.asarray(stages["A_partial_softmax"]),
        np.asarray(sim.A_partial_softmax).reshape(
            stages["A_partial_softmax"].shape
        ),
    )
    np.testing.assert_array_equal(
        np.asarray(out_i8), np.asarray(sim.Out_soft_requant)
    )
