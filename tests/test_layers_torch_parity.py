"""Numerical parity of model layer primitives vs torch (the reference's
substrate). Each check drives one primitive with shared random weights and
asserts allclose — validating that converted reference checkpoints will
reproduce (reference export parity criterion: atol 1e-5,
tests/export_onnx.py:128).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.models import layers as L  # noqa: E402
from drone_oa_iree_vit_accelerator_tpu.utils import image as I  # noqa: E402

ATOL = 1e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_conv2d_matches_torch(rng):
    x = torch.randn(2, 1, 60, 90)
    w = torch.randn(64, 1, 7, 7) * 0.1
    b = torch.randn(64) * 0.1
    ref = TF.conv2d(x, w, b, stride=2, padding=3)
    got = L.conv2d(t2j(x), {"w": t2j(w), "b": t2j(b)}, stride=2, padding=3)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)


@pytest.mark.parametrize("align", [False, True])
def test_bilinear_resize_matches_torch(align):
    torch.manual_seed(4)
    x = torch.randn(2, 3, 30, 44)
    for out_hw in [(8, 16), (60, 90), (16, 32), (7, 5)]:
        ref = TF.interpolate(x, size=out_hw, mode="bilinear", align_corners=align)
        got = I.bilinear_resize(t2j(x), out_hw, align_corners=align)
        # 5e-5: f32 matmul-formulation accumulation order differs from
        # torch's gather formulation.
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-5)


def test_bilinear_upscale_matches_torch():
    x = torch.randn(1, 64, 8, 16)
    ref = TF.interpolate(x, size=(16, 32), mode="bilinear", align_corners=True)
    got = I.bilinear_resize(t2j(x), (16, 32), align_corners=True)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=ATOL)


def test_layer_norm_matches_torch():
    x = torch.randn(2, 128, 64)
    g = torch.randn(64)
    b = torch.randn(64)
    ref = TF.layer_norm(x, (64,), g, b)
    got = L.layer_norm(t2j(x), {"g": t2j(g), "b": t2j(b)})
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=ATOL)


def test_pixel_shuffle_matches_torch():
    x = torch.randn(2, 64, 8, 16)
    ref = TF.pixel_shuffle(x, 2)
    got = I.pixel_shuffle(t2j(x), 2)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=ATOL)


def test_lstm_matches_torch_3layer():
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(input_size=517, hidden_size=128, num_layers=3, dropout=0.1)
    lstm.eval()
    x = torch.randn(1, 2, 517)  # (seq=1, B, in) as the reference feeds it
    h0 = torch.randn(3, 2, 128)
    c0 = torch.randn(3, 2, 128)
    with torch.no_grad():
        out_ref, (h_ref, c_ref) = lstm(x, (h0, c0))

    layers = tuple(
        {
            "w_ih": t2j(getattr(lstm, f"weight_ih_l{i}")).T,
            "w_hh": t2j(getattr(lstm, f"weight_hh_l{i}")).T,
            "b_ih": t2j(getattr(lstm, f"bias_ih_l{i}")),
            "b_hh": t2j(getattr(lstm, f"bias_hh_l{i}")),
        }
        for i in range(3)
    )
    out, (h, c) = L.lstm_forward(t2j(x[0]), (t2j(h0), t2j(c0)), layers)
    np.testing.assert_allclose(np.asarray(out), out_ref[0].numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=ATOL)


def test_spectral_norm_matches_torch_eval():
    torch.manual_seed(1)
    lin = torch.nn.Linear(4608, 512)
    sn = torch.nn.utils.spectral_norm(lin)
    # A few training forwards to update u, then eval.
    for _ in range(5):
        sn(torch.randn(2, 4608))
    sn.eval()
    x = torch.randn(3, 4608)
    with torch.no_grad():
        ref = sn(x)
    w_orig = t2j(sn.weight_orig).T  # our (in, out) layout
    u = t2j(sn.weight_u)
    v = t2j(sn.weight_v)
    w_sn, _, _ = L.spectral_norm_weight(w_orig, u, v, update=False)
    got = t2j(x) @ w_sn + t2j(sn.bias)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)


def test_attention_no_scaling_matches_torch_composition():
    """ITA attention = q/k/v/out linears + softmax(QK^T) with NO 1/sqrt(d)
    (reference models/ITA/layers.py:81). Compose the same math in torch."""
    torch.manual_seed(2)
    E, P, H, S, B = 64, 192, 1, 128, 2
    wq, wk, wv = (torch.randn(P, E) * 0.05 for _ in range(3))
    wo = torch.randn(E, P) * 0.05
    bq, bk, bv = (torch.randn(P) * 0.05 for _ in range(3))
    bo = torch.randn(E) * 0.05
    x = torch.randn(B, S, E)
    with torch.no_grad():
        q, k, v = TF.linear(x, wq, bq), TF.linear(x, wk, bk), TF.linear(x, wv, bv)
        attn = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
        ref = TF.linear(attn @ v, wo, bo)

    p = {
        "q": {"w": t2j(wq).T, "b": t2j(bq)},
        "k": {"w": t2j(wk).T, "b": t2j(bk)},
        "v": {"w": t2j(wv).T, "b": t2j(bv)},
        "o": {"w": t2j(wo).T, "b": t2j(bo)},
    }
    got = L.attention_f32(t2j(x), p, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-4)
