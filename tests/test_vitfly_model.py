"""vitfly-style LSTMNetVIT family: shapes, jit, and torch parity of the
Mix-Transformer pieces (EfficientSelfAttention with 1/sqrt(d) + reduced
K/V, MixFFN with depthwise conv + GELU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
from drone_oa_iree_vit_accelerator_tpu.models.vit_lstm import LSTMState


def test_forward_shapes_and_jit():
    cfg = VF.VITFLY_LSTM
    params = VF.init_params(cfg, jax.random.PRNGKey(0))
    step = jax.jit(lambda p, f, v, q, s: VF.forward(cfg, p, f, v, q, s))
    frame = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 60, 90))
    state = LSTMState(jnp.zeros((3, 2, 128)), jnp.zeros((3, 2, 128)))
    cmd, st = step(params, frame, jnp.ones((2, 1)),
                   jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)), state)
    assert cmd.shape == (2, 3)
    assert st.h.shape == (3, 2, 128)
    assert bool(jnp.all(jnp.isfinite(cmd)))
    # Recurrence: state influences output.
    cmd2, _ = step(params, frame, jnp.ones((2, 1)),
                   jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)), st)
    assert not np.allclose(np.asarray(cmd), np.asarray(cmd2))


def test_stage_dims():
    cfg = VF.VITFLY_LSTM
    params = VF.init_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 60, 90))
    f1 = VF._stage_forward(x, params["stages"][0], cfg.stages[0])
    assert f1.shape == (1, 32, 15, 23)
    f2 = VF._stage_forward(f1, params["stages"][1], cfg.stages[1])
    assert f2.shape == (1, 64, 8, 12)


def test_efficient_attention_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    torch.manual_seed(0)
    B, C, H, W, heads, rr = 2, 32, 15, 23, 1, 8
    N = H * W
    x = torch.randn(B, N, C)
    cn_w = torch.randn(C, C, rr, rr) * 0.05
    cn_b = torch.randn(C) * 0.05
    ln_g, ln_b = torch.randn(C), torch.randn(C)
    kv_w, kv_b = torch.randn(2 * C, C) * 0.1, torch.randn(2 * C) * 0.1
    q_w, q_b = torch.randn(C, C) * 0.1, torch.randn(C) * 0.1
    o_w, o_b = torch.randn(C, C) * 0.1, torch.randn(C) * 0.1

    with torch.no_grad():
        x1 = x.permute(0, 2, 1).reshape(B, C, H, W)
        x1 = TF.conv2d(x1, cn_w, cn_b, stride=rr)
        x1 = x1.reshape(B, C, -1).permute(0, 2, 1)
        x1 = TF.layer_norm(x1, (C,), ln_g, ln_b)
        kv = TF.linear(x1, kv_w, kv_b)
        kv = kv.reshape(B, -1, 2, heads, C // heads).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        q = TF.linear(x, q_w, q_b).reshape(B, N, heads, C // heads).permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-2, -1) / (C / heads) ** 0.5, dim=-1)
        ref = TF.linear((attn @ v).transpose(1, 2).reshape(B, N, C), o_w, o_b)

    p = {
        "reduce_conv": {"w": jnp.asarray(cn_w.numpy()), "b": jnp.asarray(cn_b.numpy())},
        "reduce_ln": {"g": jnp.asarray(ln_g.numpy()), "b": jnp.asarray(ln_b.numpy())},
        "kv": {"w": jnp.asarray(kv_w.numpy()).T, "b": jnp.asarray(kv_b.numpy())},
        "q": {"w": jnp.asarray(q_w.numpy()).T, "b": jnp.asarray(q_b.numpy())},
        "out": {"w": jnp.asarray(o_w.numpy()).T, "b": jnp.asarray(o_b.numpy())},
    }
    got = VF.efficient_attention(jnp.asarray(x.numpy()), p, (H, W), heads, rr)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)


def test_mix_ffn_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    torch.manual_seed(1)
    B, C, H, W, e = 1, 16, 8, 12, 4
    N, Ce = H * W, C * e
    x = torch.randn(B, N, C)
    m1_w, m1_b = torch.randn(Ce, C) * 0.1, torch.randn(Ce) * 0.1
    dw_w, dw_b = torch.randn(Ce, 1, 3, 3) * 0.1, torch.randn(Ce) * 0.1
    m2_w, m2_b = torch.randn(C, Ce) * 0.1, torch.randn(C) * 0.1
    with torch.no_grad():
        y = TF.linear(x, m1_w, m1_b)
        y2 = y.transpose(1, 2).view(B, Ce, H, W)
        y2 = TF.conv2d(y2, dw_w, dw_b, padding="same", groups=Ce)
        y = TF.gelu(y2.flatten(2).transpose(1, 2))
        ref = TF.linear(y, m2_w, m2_b)
    p = {
        "mlp1": {"w": jnp.asarray(m1_w.numpy()).T, "b": jnp.asarray(m1_b.numpy())},
        "dw": {"w": jnp.asarray(dw_w.numpy()), "b": jnp.asarray(dw_b.numpy())},
        "mlp2": {"w": jnp.asarray(m2_w.numpy()).T, "b": jnp.asarray(m2_b.numpy())},
    }
    got = VF.mix_ffn(jnp.asarray(x.numpy()), p, (H, W))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-4)
