"""Post-training quantization: calibrate observers on data, no fine-tune.

The analog of the reference's ONNX PTQ backup path
(tests/onnx_backup/quantize_ptq_onnx.py: onnxruntime quantize_static with
a calibration reader over the vitfly dataloader) and of its torchao PT2E
path: run representative frames through the model with observers
recording (no gradient steps), then freeze scales and convert.

    int_params, observers = calibrate_ptq(cfg, params, frames_u8)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models import vit_lstm as M
from .convert import convert_model
from .qat import QATObservers, qat_block_fns


def calibrate_ptq(
    cfg: ModelConfig,
    params: dict,
    frames_u8: jax.Array,  # (N, 1, H, W) uint8 calibration frames
    vel: jax.Array | None = None,
    quat: jax.Array | None = None,
    batch_size: int = 8,
    per_channel: bool = False,
) -> tuple[dict, QATObservers]:
    """Run calibration frames through the full model (observers updating,
    STE irrelevant — no grads) and convert. Returns (int_params, observers).

    ``per_channel=True`` quantizes weights per output channel — the
    reference ARM config (tests/p2e_backup/ita_quantization_specs.py:47-67).
    Per-channel int_params run through the XLA integer path only.
    """
    n = frames_u8.shape[0]
    if vel is None:
        vel = jnp.ones((n, 1), jnp.float32)
    if quat is None:
        quat = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)

    @jax.jit
    def calib_step(params, observers, frames, vel, quat):
        attn_fn, ffn_fn, collect = qat_block_fns(params, observers, cfg.H)
        M.forward(
            cfg, params,
            frames.astype(jnp.float32) / 255.0,
            vel, quat, attn_fn=attn_fn, ffn_fn=ffn_fn,
        )
        return collect()

    observers = QATObservers.init(cfg.num_layers)
    batch_size = min(batch_size, n)
    # Full batches only (a ragged tail would trigger a recompile).
    for i in range(0, n - batch_size + 1, batch_size):
        observers = calib_step(
            params, observers, frames_u8[i : i + batch_size],
            vel[i : i + batch_size], quat[i : i + batch_size],
        )
    int_params = jax.jit(convert_model, static_argnums=(2, 3))(
        params, observers, cfg.H, per_channel
    )
    return int_params, observers
