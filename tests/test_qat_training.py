"""QAT model-level forward/backward: observers thread, gradients flow."""

import jax
import jax.numpy as jnp
import numpy as np

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu import quant as QZ


def _qat_step(params, observers, frame, vel, quat, target):
    def loss_fn(p):
        attn_fn, ffn_fn, collect = QZ.qat_block_fns(p, observers, CFG.H)
        cmd, _ = M.forward(CFG, p, frame, vel, quat, attn_fn=attn_fn, ffn_fn=ffn_fn)
        return jnp.mean((cmd - target) ** 2), collect()

    (loss, new_obs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, new_obs, grads


def test_qat_forward_updates_observers_and_grads_flow():
    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    observers = QZ.QATObservers.init(CFG.num_layers)
    frame = jax.random.uniform(key, (2, 1, 60, 90))
    vel = jnp.ones((2, 1))
    quat = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
    target = jnp.zeros((2, 3))

    step = jax.jit(_qat_step)
    loss, obs1, grads = step(params, observers, frame, vel, quat, target)
    assert bool(jnp.isfinite(loss))
    # Observers initialized by the pass.
    assert bool(obs1.attn[0].in_.initialized)
    assert bool(obs1.ffn[0].fc2.initialized)
    assert float(obs1.attn[0].qk.max_val) != 0.0
    # Quantized-block weights receive gradient through the STE.
    g_attn = grads["blocks"][0]["attn"]["q"]["w"]
    g_ffn = grads["blocks"][0]["ffn"]["fc1"]["w"]
    assert float(jnp.max(jnp.abs(g_attn))) > 0
    assert float(jnp.max(jnp.abs(g_ffn))) > 0

    # Second step moves the EMA.
    loss2, obs2, _ = step(params, obs1, frame * 2.0, vel, quat, target)
    assert float(obs2.attn[0].in_.max_val) != float(obs1.attn[0].in_.max_val)


def test_qat_eval_mode_is_pure():
    key = jax.random.PRNGKey(1)
    params = M.init_params(CFG, key)
    observers = QZ.QATObservers.init(CFG.num_layers)
    x = 0.3 * jax.random.normal(key, (1, CFG.S, CFG.E))
    # Calibrate once.
    _, obs = QZ.attention_qat(x, params["blocks"][0]["attn"], observers.attn[0], CFG.H)
    y1, obs_e1 = QZ.attention_qat(
        x, params["blocks"][0]["attn"], obs, CFG.H, update_obs=False
    )
    y2, obs_e2 = QZ.attention_qat(
        x, params["blocks"][0]["attn"], obs, CFG.H, update_obs=False
    )
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert float(obs_e1.in_.max_val) == float(obs.in_.max_val)
