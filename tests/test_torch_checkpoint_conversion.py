"""Full-model parity: a torch-built flagship model's state_dict converts
and reproduces outputs through our JAX model (the reference-checkpoint
drop-in path, models/params_io.from_torch_state_dict).

The torch model here is built from stock torch modules with the
reference's module names (so the converter sees realistic keys); the
forward composition below is the spec from SURVEY.md section 3.2.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from drone_oa_iree_vit_accelerator_tpu.core import (  # noqa: E402
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import (  # noqa: E402
    params_io,
    vit_lstm as M,
)


class TorchFlagship(nn.Module):
    """Reference-named modules; forward per SURVEY.md section 3.2."""

    def __init__(self):
        super().__init__()
        E, P, F = CFG.E, CFG.P, CFG.F

        class Tok(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(1, E, 7, stride=2, padding=3)
                self.norm = nn.LayerNorm(E)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.q_proj = nn.Linear(E, P)
                self.k_proj = nn.Linear(E, P)
                self.v_proj = nn.Linear(E, P)
                self.out_proj = nn.Linear(P, E)

        class FFN(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(E, F)
                self.fc2 = nn.Linear(F, E)

        self.tokenizer = Tok()
        self.attention_blocks = nn.ModuleList([Attn()])
        self.ffn_blocks = nn.ModuleList([FFN()])
        self.norms1 = nn.ModuleList([nn.LayerNorm(E)])
        self.norms2 = nn.ModuleList([nn.LayerNorm(E)])
        self.down_sample = nn.Conv2d(E // 4 + E, 9, 3, padding=1)
        self.decoder = nn.utils.spectral_norm(nn.Linear(4608, 512))
        self.lstm = nn.LSTM(517, 128, num_layers=3, dropout=0.1)
        self.nn_fc2 = nn.utils.spectral_norm(nn.Linear(128, 3))

    def forward(self, img, vel, quat, hc):
        t = self.tokenizer
        x = TF.interpolate(
            t.conv(img), size=(8, 16), mode="bilinear", align_corners=False
        )
        x = t.norm(x.flatten(2).transpose(1, 2))  # (B, 128, 64)
        a = self.attention_blocks[0]
        q, k, v = a.q_proj(x), a.k_proj(x), a.v_proj(x)
        attn = torch.softmax(q @ k.transpose(-2, -1), dim=-1) @ v
        x = self.norms1[0](x + a.out_proj(attn))
        f = self.ffn_blocks[0]
        x = self.norms2[0](x + f.fc2(torch.relu(f.fc1(x))))
        x2d = x.transpose(1, 2).reshape(-1, CFG.E, 8, 16)
        fused = torch.cat(
            [
                TF.pixel_shuffle(x2d, 2),
                TF.interpolate(x2d, size=(16, 32), mode="bilinear",
                               align_corners=True),
            ],
            dim=1,
        )
        flat = self.down_sample(fused).flatten(1)
        out = torch.cat([self.decoder(flat), vel / 10.0, quat], dim=1)
        y, hc = self.lstm(out.unsqueeze(0), hc)
        return self.nn_fc2(y.squeeze(0)), hc


def test_torch_state_dict_converts_and_matches():
    torch.manual_seed(0)
    tm = TorchFlagship()
    # A couple of training-mode forwards advance the spectral-norm power
    # iteration (as real training would), then freeze for eval.
    for _ in range(3):
        tm(
            torch.rand(2, 1, 60, 90), torch.ones(2, 1), torch.rand(2, 4),
            None,
        )
    tm.eval()

    img = torch.rand(2, 1, 60, 90)
    vel = torch.full((2, 1), 5.0)
    quat = torch.tensor([[1.0, 0, 0, 0], [0.9, 0.1, 0.2, 0.3]])
    h0 = torch.randn(3, 2, 128)
    c0 = torch.randn(3, 2, 128)
    with torch.no_grad():
        cmd_ref, (h_ref, c_ref) = tm(img, vel, quat, (h0, c0))

    params = params_io.from_torch_state_dict(tm.state_dict(), CFG)
    cmd, st = M.forward(
        CFG,
        params,
        jnp.asarray(img.numpy()),
        jnp.asarray(vel.numpy()),
        jnp.asarray(quat.numpy()),
        M.LSTMState(jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())),
    )
    np.testing.assert_allclose(
        np.asarray(cmd), cmd_ref.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(st.h), h_ref.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.c), c_ref.numpy(), atol=2e-4)
