"""Pallas fused encoder kernel vs the jnp integer golden model.

Bit-exactness contract (SURVEY.md sections 3.5/7): the Pallas kernel IS the
"accelerator"; the jnp golden path is its PyITA. They must agree exactly
(not MAE <= 1 — exactly: both implement the same integer spec).
Interpret mode stands in for the reference's x86 dummy-dispatch testing
(SURVEY.md section 4.4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import layers as L
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
    ita_encoder_block,
)
from drone_oa_iree_vit_accelerator_tpu import quant as QZ


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    params = M.init_params(CFG, key)
    observers = QZ.QATObservers.init(CFG.num_layers)
    for i in range(4):
        x = 0.5 * jax.random.normal(jax.random.fold_in(key, i), (2, CFG.S, CFG.E))
        _, oa = QZ.attention_qat(
            x, params["blocks"][0]["attn"], observers.attn[0], CFG.H
        )
        _, of = QZ.ffn_qat(x, params["blocks"][0]["ffn"], observers.ffn[0])
        observers = QZ.QATObservers(attn=(oa,), ffn=(of,))
    ip = QZ.convert_model(params, observers, CFG.H)
    return params, ip


def golden_block(x, params, ip):
    """Reference composition: golden int path + residual/LN glue."""
    blk = params["blocks"][0]
    attn = jax.vmap(lambda s: II.ita_attention_f32(s, ip["attn"][0]))(x)
    h = L.layer_norm(x + attn, blk["ln1"])
    ffn = jax.vmap(lambda s: II.ita_ffn_f32(s, ip["ffn"][0]))(h)
    return L.layer_norm(h + ffn, blk["ln2"])


def test_kernel_interpret_bit_exact_vs_golden(setup):
    params, ip = setup
    blk = params["blocks"][0]
    key = jax.random.PRNGKey(11)
    x = 0.5 * jax.random.normal(key, (2, CFG.S, CFG.E))

    ref = golden_block(x, params, ip)
    got = ita_encoder_block(
        x, ip["attn"][0], ip["ffn"][0], blk["ln1"], blk["ln2"], interpret=True
    )
    # The integer stages must agree bit-for-bit; the float glue (dequant,
    # LN) may differ only by f32 rounding in the last ulps.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_interpret_integer_stage_exactness(setup):
    """Drive the kernel with inputs that exercise softmax saturation and
    requant clamping; outputs must still match the golden path."""
    params, ip = setup
    blk = params["blocks"][0]
    key = jax.random.PRNGKey(13)
    # Large-amplitude inputs -> saturated int8 grid, extreme logits.
    x = 4.0 * jax.random.normal(key, (1, CFG.S, CFG.E))
    ref = golden_block(x, params, ip)
    got = ita_encoder_block(
        x, ip["attn"][0], ip["ffn"][0], blk["ln1"], blk["ln2"], interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_batch_grid(setup):
    params, ip = setup
    blk = params["blocks"][0]
    x = 0.3 * jax.random.normal(jax.random.PRNGKey(17), (4, CFG.S, CFG.E))
    ref = golden_block(x, params, ip)
    got = ita_encoder_block(
        x, ip["attn"][0], ip["ffn"][0], blk["ln1"], blk["ln2"], interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_long_division_helper():
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.ita_kernel import (
        _SOFTMAX_NUM,
        _floor_div_u25,
    )

    dens = np.concatenate(
        [[1, 2, 3, 255, 256, 257], np.arange(1, 32769, 517), [32768]]
    ).astype(np.int32)
    got = np.asarray(_floor_div_u25(_SOFTMAX_NUM, jnp.asarray(dens)))
    np.testing.assert_array_equal(got, _SOFTMAX_NUM // dens)


def test_pallas_forward_full_model_matches_int8_forward(setup):
    params, ip = setup
    key = jax.random.PRNGKey(19)
    frame = jax.random.uniform(key, (2, 1, 60, 90))
    vel = jnp.ones((2, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))

    cmd_ref, st_ref = QZ.int8_forward(CFG, params, ip, frame, vel, quat)
    cmd_pal, st_pal = QZ.pallas_forward(
        CFG, params, ip, frame, vel, quat, interpret=True
    )
    # Same integer arithmetic; only f32 glue rounding may differ.
    np.testing.assert_allclose(
        np.asarray(cmd_pal), np.asarray(cmd_ref), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_pal.h), np.asarray(st_ref.h), atol=1e-4
    )


def test_fused_two_kernel_serving_step_matches_pallas_path(setup):
    """The minimum-launch two-kernel deployment step (encoder kernel +
    tail kernel with in-kernel LSTM/post-processing) is numerically
    identical to the standard pallas path."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline import wire
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_fused_serving_step,
        make_serving_step,
    )

    params, ip = setup
    args = (
        jnp.full(wire.IMAGE_SHAPE, 99, jnp.uint8),
        jnp.float32(4.0),
        jnp.float32(7.0),
        jnp.asarray([0.9, 0.1, 0.2, 0.3], jnp.float32),
    )
    cmd_ref, st_ref = make_serving_step(CFG, "pallas")(
        params, ip, *args, M.zero_state(CFG, 1)
    )
    cmd_f, st_f = make_fused_serving_step(CFG)(
        params, ip, *args, M.zero_state(CFG, 1)
    )
    np.testing.assert_allclose(np.asarray(cmd_f), np.asarray(cmd_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_f.h), np.asarray(st_ref.h), atol=1e-6)


def test_tail_kernel_batched_matches_reference_math(setup):
    """tail_fused over a batch grid == decoder/LSTM/head/postprocess
    composed from models.layers (eval semantics)."""
    from drone_oa_iree_vit_accelerator_tpu.models import layers as L
    from drone_oa_iree_vit_accelerator_tpu.ops.pallas.tail_kernel import tail_fused
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        postprocess_velocity,
    )

    params, _ = setup
    b = 3
    key = jax.random.PRNGKey(23)
    flat = jax.random.normal(key, (b, CFG.decoder_in))
    vel = jnp.float32(4.0)
    pos_x = jnp.float32(9.0)
    extra = jnp.concatenate(
        [jnp.full((b, 1), vel / 10.0), jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (b, 1))],
        axis=1,
    )
    h = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (3, b, 128))
    c = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (3, b, 128))

    dec, head = params["decoder"], params["fc2"]
    dec_w, _, _ = L.spectral_norm_weight(dec["w"], dec["u"], dec["v"])
    head_w, _, _ = L.spectral_norm_weight(head["w"], head["u"], head["v"])

    cmd, h2, c2 = tail_fused(
        flat, extra, vel, pos_x, dec_w, dec["b"], params["lstm"],
        head_w, head["b"], h, c, interpret=True,
    )

    # Reference composition.
    out = flat @ dec_w + dec["b"]
    feat = jnp.concatenate([out, extra], axis=1)
    y, (h_ref, c_ref) = L.lstm_forward(feat, (h, c), params["lstm"])
    cmd_raw = y @ head_w + head["b"]
    cmd_ref = jax.vmap(lambda r: postprocess_velocity(r, vel, pos_x))(cmd_raw)

    np.testing.assert_allclose(np.asarray(cmd), np.asarray(cmd_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_ref), atol=1e-5)


@pytest.mark.parametrize("heads", [2, 3])
@pytest.mark.parametrize("batched_core", [False, True])
def test_kernel_multihead_matches_golden(heads, batched_core):
    """H>1 head-split layouts (VERDICT r3 item 6): the kernel's unrolled
    per-head column slices must agree with the golden model's
    _split_heads path on every element. P=192 divides into d=96 (H=2)
    and d=64 (H=3)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, name=f"flagship_H{heads}", H=heads)
    key = jax.random.PRNGKey(29 + heads)
    params = M.init_params(cfg, key)
    observers = QZ.QATObservers.init(cfg.num_layers)
    for i in range(4):
        x = 0.5 * jax.random.normal(
            jax.random.fold_in(key, i), (2, cfg.S, cfg.E)
        )
        _, oa = QZ.attention_qat(
            x, params["blocks"][0]["attn"], observers.attn[0], cfg.H
        )
        _, of = QZ.ffn_qat(x, params["blocks"][0]["ffn"], observers.ffn[0])
        observers = QZ.QATObservers(attn=(oa,), ffn=(of,))
    ip = QZ.convert_model(params, observers, cfg.H)
    assert ip["attn"][0].num_heads == heads

    blk = params["blocks"][0]
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(31), (2, cfg.S, cfg.E))
    ref = golden_block(x, params, ip)
    got = ita_encoder_block(
        x, ip["attn"][0], ip["ffn"][0], blk["ln1"], blk["ln2"],
        interpret=True, batched_core=batched_core,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("heads", [2])
def test_kernel_multihead_streaming_softmax(heads):
    """H=2 with the hardware-default streaming softmax: kernel == golden."""
    import dataclasses

    cfg = dataclasses.replace(CFG, name="flagship_H2s", H=heads)
    key = jax.random.PRNGKey(37)
    params = M.init_params(cfg, key)
    observers = QZ.QATObservers.init(cfg.num_layers)
    for i in range(3):
        x = 0.5 * jax.random.normal(
            jax.random.fold_in(key, i), (1, cfg.S, cfg.E)
        )
        _, oa = QZ.attention_qat(
            x, params["blocks"][0]["attn"], observers.attn[0], cfg.H
        )
        _, of = QZ.ffn_qat(x, params["blocks"][0]["ffn"], observers.ffn[0])
        observers = QZ.QATObservers(attn=(oa,), ffn=(of,))
    ip = QZ.convert_model(params, observers, cfg.H)

    blk = params["blocks"][0]
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(41), (1, cfg.S, cfg.E))
    attn = jax.vmap(
        lambda s: II.ita_attention_f32(
            s, ip["attn"][0], softmax_mode="streaming"
        )
    )(x)
    h = L.layer_norm(x + attn, blk["ln1"])
    ffn = jax.vmap(lambda s: II.ita_ffn_f32(s, ip["ffn"][0]))(h)
    ref = L.layer_norm(h + ffn, blk["ln2"])
    got = ita_encoder_block(
        x, ip["attn"][0], ip["ffn"][0], blk["ln1"], blk["ln2"],
        interpret=True, softmax_mode="streaming",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
