"""End-to-end float forward tests for the ITAViTLSTM model family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_BASE,
    ITA_SINGLE_LAYER,
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
    ITA_UPSAMPLE_SHUFFLE,
    MODEL_ZOO,
)
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M


@pytest.mark.parametrize("cfg", list(MODEL_ZOO.values()), ids=lambda c: c.name)
def test_forward_shapes_all_variants(cfg):
    key = jax.random.PRNGKey(0)
    params = M.init_params(cfg, key)
    b = 2
    frame = jax.random.uniform(key, (b, 1, *cfg.img_hw))
    vel = jnp.ones((b, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (b, 1))
    cmd, state = M.forward(cfg, params, frame, vel, quat)
    assert cmd.shape == (b, cfg.out_dim)
    assert state.h.shape == (cfg.lstm_layers, b, cfg.lstm_hidden)
    assert bool(jnp.all(jnp.isfinite(cmd)))


def test_forward_jit_and_state_threading():
    cfg = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE
    key = jax.random.PRNGKey(1)
    params = M.init_params(cfg, key)
    step = jax.jit(lambda p, f, v, q, s: M.forward(cfg, p, f, v, q, s))

    frame = jax.random.uniform(key, (1, 1, 60, 90))
    vel = jnp.ones((1, 1))
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    state = M.zero_state(cfg, 1)
    cmd1, state = step(params, frame, vel, quat, state)
    cmd2, state2 = step(params, frame, vel, quat, state)
    # LSTM state must influence the output (recurrent memory).
    assert not np.allclose(np.asarray(cmd1), np.asarray(cmd2))
    assert not np.allclose(np.asarray(state.h), np.asarray(state2.h))


def test_refine_inputs_synthesizes_quat_and_resizes():
    cfg = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE
    frame = jnp.ones((2, 1, 30, 45))
    frame2, quat = M.refine_inputs(cfg, frame, None)
    assert frame2.shape == (2, 1, 60, 90)
    np.testing.assert_array_equal(
        np.asarray(quat), np.tile([[1.0, 0, 0, 0]], (2, 1))
    )


def test_decoder_in_dims():
    assert ITA_BASE.decoder_in == 128 * 128
    assert ITA_SINGLE_LAYER.decoder_in == 64 * 128
    assert ITA_UPSAMPLE_SHUFFLE.decoder_in == 128 * 128
    assert ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE.decoder_in == 4608


def test_gradients_flow():
    cfg = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE
    key = jax.random.PRNGKey(2)
    params = M.init_params(cfg, key)
    frame = jax.random.uniform(key, (2, 1, 60, 90))
    vel = jnp.ones((2, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    target = jnp.ones((2, 3))
    # Nonzero LSTM state: from a zero state, w_hh gradients are
    # legitimately zero on the first step (h=0 contributes nothing).
    k1, k2 = jax.random.split(key)
    state = M.LSTMState(
        0.1 * jax.random.normal(k1, (cfg.lstm_layers, 2, cfg.lstm_hidden)),
        0.1 * jax.random.normal(k2, (cfg.lstm_layers, 2, cfg.lstm_hidden)),
    )

    def loss(p):
        cmd, _ = M.forward(cfg, p, frame, vel, quat, state)
        return jnp.mean((cmd - target) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # All weight leaves receive gradient signal except spectral-norm u
    # vectors (frozen power-iteration state).
    flat = jax.tree_util.tree_leaves_with_path(g)
    dead = [
        jax.tree_util.keystr(k)
        for k, l in flat
        if float(jnp.max(jnp.abs(l))) == 0.0 and "'u'" not in jax.tree_util.keystr(k)
    ]
    assert not dead, f"dead gradients: {dead}"
