"""Tests for the batched throughput serving path (quant/batched.py):
factored tokenizer, precomposed tail matrix, batched-core encoder kernel,
and the turbo forward end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_BASE,
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu import quant as QZ
from drone_oa_iree_vit_accelerator_tpu.quant.batched import (
    make_tail,
    turbo_forward,
)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    frames_cal = jax.random.randint(key, (8, 1, 60, 90), 0, 256, jnp.uint8)
    int_params, _ = QZ.calibrate_ptq(CFG, params, frames_cal)
    return params, int_params


def test_factored_tokenizer_matches_conv_resize(setup):
    """tokenizer_tokens_factored == resize(conv(x)) to f32 tolerance."""
    params, _ = setup
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 1, 60, 90))
    fac = L.tokenizer_tokens_factored(x, params["tokenizer"], CFG)
    ref = L.tokenizer_forward(x, params["tokenizer"], CFG)  # LN'd
    fac_ln = L.layer_norm(fac, params["tokenizer"]["ln"])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fac_ln),
                               rtol=1e-4, atol=1e-5)


def test_tail_matrix_exact(setup):
    """W_tail reproduces fuse_tokens + decoder (linear map => exact up to
    f32 summation order)."""
    params, _ = setup
    fp = M.freeze_for_inference(CFG, params)
    w, b = M.make_tail_matrix(CFG, params)
    y = jax.random.normal(jax.random.PRNGKey(2), (8, CFG.S, CFG.E))
    ref = M.fuse_tokens(CFG, fp, y) @ fp["decoder"]["w"] + fp["decoder"]["b"]
    got = y.reshape(8, -1) @ w + b
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=1e-5)


def test_tail_matrix_flatten_is_decoder():
    """For FLATTEN-fusion configs the tail IS the (frozen) decoder."""
    params = M.init_params(ITA_BASE, jax.random.PRNGKey(3))
    tail = make_tail(ITA_BASE, params, dtype=jnp.float32)
    fp = M.freeze_for_inference(ITA_BASE, params)
    np.testing.assert_array_equal(
        np.asarray(tail.w), np.asarray(fp["decoder"]["w"])
    )


@pytest.mark.parametrize("mode", ["onepass", "streaming"])
def test_batched_core_bit_identical_to_loop_core(setup, mode):
    """encoder_core_batched == encoder_core exactly (same integer ops,
    restructured scheduling), interpret mode."""
    params, int_params = setup
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
        ita_encoder_block,
    )

    blk = params["blocks"][0]
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 128, 64), jnp.float32)
    a = ita_encoder_block(
        x, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], interpret=True, softmax_mode=mode,
    )
    b = ita_encoder_block(
        x, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], interpret=True, softmax_mode=mode, batched_core=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_turbo_matches_int8_path(setup):
    """turbo (f32 glue, golden encoder) tracks int8_forward to glue
    tolerance; pallas-interpret encoder is bit-identical to the golden
    encoder inside turbo."""
    params, int_params = setup
    fp = M.freeze_for_inference(CFG, params)
    tail = make_tail(CFG, params, dtype=jnp.float32)
    b = 4
    frame = jax.random.uniform(jax.random.PRNGKey(5), (b, 1, 60, 90))
    vel = jnp.ones((b, 1))
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(CFG, b)
    ref, st_ref = QZ.int8_forward(CFG, fp, int_params, frame, vel, quat, state)
    got, st = turbo_forward(
        CFG, fp, int_params, tail, frame, vel, quat, state,
        encoder="int8", glue_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_ref.h), np.asarray(st.h), rtol=1e-3, atol=2e-4
    )
    got_p, _ = turbo_forward(
        CFG, fp, int_params, tail, frame, vel, quat, state,
        encoder="pallas", interpret=True, glue_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_p))


def test_turbo_bf16_glue_tracks_f32_glue(setup):
    params, int_params = setup
    fp = M.freeze_for_inference(CFG, params)
    tail = make_tail(CFG, params)
    b = 4
    frame = jax.random.uniform(jax.random.PRNGKey(6), (b, 1, 60, 90))
    vel = jnp.ones((b, 1))
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(CFG, b)
    f32cmd, _ = turbo_forward(
        CFG, fp, int_params, make_tail(CFG, params, dtype=jnp.float32),
        frame, vel, quat, state, encoder="int8", glue_dtype=jnp.float32,
    )
    bfcmd, bfst = turbo_forward(
        CFG, fp, int_params, tail, frame, vel, quat, state, encoder="int8"
    )
    assert bfst.h.dtype == jnp.float32  # state returns f32 at the boundary
    np.testing.assert_allclose(np.asarray(f32cmd), np.asarray(bfcmd),
                               rtol=0.05, atol=0.02)


def test_turbo_on_flatten_config():
    """turbo serves the ITA base (2-layer E=128, FLATTEN) config too."""
    params = M.init_params(ITA_BASE, jax.random.PRNGKey(7))
    int_params, _ = QZ.calibrate_ptq(
        ITA_BASE, params,
        jax.random.randint(jax.random.PRNGKey(8), (8, 1, 60, 90), 0, 256,
                           jnp.uint8),
    )
    fp = M.freeze_for_inference(ITA_BASE, params)
    tail = make_tail(ITA_BASE, params, dtype=jnp.float32)
    b = 2
    frame = jax.random.uniform(jax.random.PRNGKey(9), (b, 1, 60, 90))
    vel = jnp.ones((b, 1))
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(ITA_BASE, b)
    ref, _ = QZ.int8_forward(ITA_BASE, fp, int_params, frame, vel, quat, state)
    got, _ = turbo_forward(
        ITA_BASE, fp, int_params, tail, frame, vel, quat, state,
        encoder="int8", glue_dtype=jnp.float32,
    )
    # The factored tokenizer matches resize(conv(x)) only to f32
    # summation order (~1e-6 post-LN); tokens landing on an int8
    # quantization boundary can flip +-1 LSB, and the 2-layer E=128
    # encoder amplifies a flip to ~3% of the (random-init) command.
    # The flagship test above is 1-layer and tighter; bit-identity of
    # the integer region itself is pinned by the pallas-vs-golden
    # comparison below and tests/test_ita_oracle.py.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=0.05, atol=2e-3)


def test_batched_serving_step_auto(setup):
    """make_batched_serving_step('auto') routes the flagship to the turbo
    pipeline with the Pallas encoder and matches the per-frame int8 path
    + velocity post-processing at glue tolerance."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_batched_serving_step,
        postprocess_velocity,
    )

    params, int_params = setup
    fp = M.freeze_for_inference(CFG, params)
    tail = make_tail(CFG, params)
    b = 4
    key = jax.random.PRNGKey(11)
    frames_u8 = jax.random.randint(key, (b, 60, 90), 0, 256, jnp.uint8)
    vel = jnp.full((b,), 5.0)
    pos_x = jnp.asarray([0.5, 3.0, 10.0, 1.9])
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(CFG, b)

    step = make_batched_serving_step(CFG, path="auto")
    cmds, new_state = step(
        fp, int_params, tail, frames_u8, vel, pos_x, quat, state
    )
    assert cmds.shape == (b, 3) and new_state.h.dtype == jnp.float32

    frame = frames_u8.astype(jnp.float32)[:, None, :, :] / 255.0
    raw, _ = QZ.int8_forward(
        CFG, fp, int_params, frame, vel[:, None], quat, M.zero_state(CFG, b)
    )
    ref = jax.vmap(postprocess_velocity)(raw, vel, pos_x)
    np.testing.assert_allclose(np.asarray(cmds), np.asarray(ref),
                               rtol=0.08, atol=0.05)
    # The pos_x < 2 floor applies to frames 0 and 3 exactly.
    expect_floor = np.maximum(1.0, np.asarray(pos_x) / 2.0 * 5.0)
    np.testing.assert_allclose(
        np.asarray(cmds)[[0, 3], 0], expect_floor[[0, 3]], rtol=1e-6
    )


def test_encoder_kernel_out_dtype_and_pre_ln(setup):
    """out_dtype=bf16 emits bf16 equal to the f32 output's bf16 cast;
    pre_ln in-kernel equals XLA layer_norm + kernel (exact, both f32)."""
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
        ita_encoder_block,
    )

    params, int_params = setup
    blk = params["blocks"][0]
    tok_ln = params["tokenizer"]["ln"]
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 128, 64), jnp.float32)

    ref = ita_encoder_block(
        L.layer_norm(x, tok_ln), int_params["attn"][0], int_params["ffn"][0],
        blk["ln1"], blk["ln2"], interpret=True,
    )
    got = ita_encoder_block(
        x, int_params["attn"][0], int_params["ffn"][0],
        blk["ln1"], blk["ln2"], interpret=True, pre_ln=tok_ln,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-6, atol=1e-6)

    got16 = ita_encoder_block(
        x, int_params["attn"][0], int_params["ffn"][0],
        blk["ln1"], blk["ln2"], interpret=True, pre_ln=tok_ln,
        out_dtype=jnp.bfloat16,
    )
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got16), np.asarray(got.astype(jnp.bfloat16))
    )


def test_turbo_head_spectral_norm_gated_on_config():
    """fc2 spectral norm must follow cfg.spectral_norm_decoder, not the
    mere presence of 'u' (init_params always creates u/v): for ITA_BASE
    (spectral_norm_decoder=False) the turbo head must use the RAW
    weight exactly like M.forward. Regression: with the head weights
    dominating (bias zeroed), the wrongly normalized head scaled
    commands by 1/sigma ~ 2.2x."""
    params = M.init_params(ITA_BASE, jax.random.PRNGKey(21))
    assert "u" in params["fc2"]  # the trap: u/v exist regardless of cfg
    params["fc2"]["b"] = jnp.zeros_like(params["fc2"]["b"])
    int_params, _ = QZ.calibrate_ptq(
        ITA_BASE, params,
        jax.random.randint(jax.random.PRNGKey(22), (8, 1, 60, 90), 0, 256,
                           jnp.uint8),
    )
    fp = M.freeze_for_inference(ITA_BASE, params)
    tail = make_tail(ITA_BASE, params, dtype=jnp.float32)
    b = 2
    frame = jax.random.uniform(jax.random.PRNGKey(23), (b, 1, 60, 90))
    vel = jnp.ones((b, 1))
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(ITA_BASE, b)
    ref, _ = QZ.int8_forward(ITA_BASE, fp, int_params, frame, vel, quat, state)
    got, _ = turbo_forward(
        ITA_BASE, fp, int_params, tail, frame, vel, quat, state,
        encoder="int8", glue_dtype=jnp.float32,
    )
    # Relative agreement: a 2.2x head scaling fails this decisively.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=1e-4)


@pytest.mark.parametrize("mode", ["onepass", "streaming"])
def test_transposed_core_bit_identical_to_batched_core(setup, mode):
    """encoder_core_batched_T (channels-on-sublanes layout) == the
    row-major batched core, interpret mode: same integer ops per
    element; the f32 LN reduces the same 64 values (XLA interpret
    evaluates both orders identically — the on-TPU drive re-checks
    compiled parity at reduction-order tolerance)."""
    params, int_params = setup
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
        ita_encoder_block,
        ita_encoder_block_T,
    )

    blk = params["blocks"][0]
    b = 8
    x = jax.random.normal(jax.random.PRNGKey(4), (b, 128, 64), jnp.float32)
    xT = jnp.transpose(x, (2, 0, 1)).reshape(CFG.E, b * CFG.S)
    ref = ita_encoder_block(
        x, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], interpret=True, softmax_mode=mode, batched_core=True,
    )
    gotT = ita_encoder_block_T(
        xT, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], seq=CFG.S, interpret=True, softmax_mode=mode,
    )
    got = jnp.transpose(
        gotT.reshape(CFG.E, b, CFG.S), (1, 2, 0)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_transposed_block_pre_ln_and_out_dtype(setup):
    """The T-block's turbo extras (in-kernel pre-LN, bf16 out) match
    applying LN outside + casting outside."""
    params, int_params = setup
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
        ita_encoder_block_T,
    )

    blk = params["blocks"][0]
    pln = params["tokenizer"]["ln"]
    b = 4
    x = jax.random.normal(jax.random.PRNGKey(9), (b, 128, 64), jnp.float32)
    xT = jnp.transpose(x, (2, 0, 1)).reshape(CFG.E, b * CFG.S)
    ln_then = ita_encoder_block_T(
        jnp.transpose(
            L.layer_norm(x, pln), (2, 0, 1)
        ).reshape(CFG.E, b * CFG.S),
        int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], seq=CFG.S, interpret=True, max_nb=4,
    )
    fused = ita_encoder_block_T(
        xT, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], seq=CFG.S, interpret=True, max_nb=4, pre_ln=pln,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ln_then),
                               rtol=1e-5, atol=1e-5)
    out16 = ita_encoder_block_T(
        xT, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], seq=CFG.S, interpret=True, max_nb=4,
        out_dtype=jnp.bfloat16,
    )
    base = ita_encoder_block_T(
        xT, int_params["attn"][0], int_params["ffn"][0], blk["ln1"],
        blk["ln2"], seq=CFG.S, interpret=True, max_nb=4,
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out16), np.asarray(base.astype(jnp.bfloat16))
    )


def test_tokenizer_factored_T_matches_row_major(setup):
    """tokenizer_tokens_factored_T == the row-major factored tokenizer
    (same stage-1/2 GEMMs; the stage-3 dot contracts the same taps)."""
    params, _ = setup
    b = 4
    x = jax.random.uniform(jax.random.PRNGKey(11), (b, 1, 60, 90))
    tok = L.tokenizer_tokens_factored(x, params["tokenizer"], CFG)
    tokT = L.tokenizer_tokens_factored_T(x, params["tokenizer"], CFG)
    got = jnp.transpose(tokT.reshape(CFG.E, b, CFG.S), (1, 2, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(tok),
                               rtol=1e-5, atol=1e-6)


def test_make_tail_e_major_is_row_permutation(setup):
    """make_tail(e_major=True) is exactly the (s*E+e) -> (e*S+s) row
    permutation of the standard tail."""
    params, _ = setup
    tail = make_tail(CFG, params, dtype=jnp.float32)
    tailT = make_tail(CFG, params, dtype=jnp.float32, e_major=True)
    back = (
        np.asarray(tailT.w)
        .reshape(CFG.E, CFG.S, -1)
        .transpose(1, 0, 2)
        .reshape(CFG.S * CFG.E, -1)
    )
    np.testing.assert_array_equal(back, np.asarray(tail.w))
    np.testing.assert_array_equal(np.asarray(tailT.b), np.asarray(tail.b))


@pytest.mark.parametrize("mode", ["onepass", "streaming"])
def test_turbo_pallas_T_matches_pallas(setup, mode):
    """The fully transposed turbo pipeline (tokenizer_T -> T-kernel ->
    e-major tail) matches the row-major turbo pipeline end to end."""
    params, int_params = setup
    fp = M.freeze_for_inference(CFG, params)
    tail = make_tail(CFG, params, dtype=jnp.float32)
    tailT = make_tail(CFG, params, dtype=jnp.float32, e_major=True)
    b = 4
    frame = jax.random.uniform(jax.random.PRNGKey(12), (b, 1, 60, 90))
    vel = jnp.ones((b, 1))
    quat = jnp.zeros((b, 4)).at[:, 0].set(1.0)
    state = M.zero_state(CFG, b)
    ref, st_ref = turbo_forward(
        CFG, fp, int_params, tail, frame, vel, quat, state,
        encoder="pallas", interpret=True, glue_dtype=jnp.float32,
        softmax_mode=mode,
    )
    got, st = turbo_forward(
        CFG, fp, int_params, tailT, frame, vel, quat, state,
        encoder="pallas_T", interpret=True, glue_dtype=jnp.float32,
        softmax_mode=mode,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st.h), np.asarray(st_ref.h),
                               rtol=1e-4, atol=1e-5)
