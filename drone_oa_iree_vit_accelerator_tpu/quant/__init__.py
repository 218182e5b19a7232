import jax

from ..ops.integer_ita import ita_attention_f32, ita_ffn_f32
from .convert import convert_attention, convert_ffn, convert_model
from .ptq import calibrate_ptq
from .qat import (
    AttnObservers,
    FFNObservers,
    QATObservers,
    attention_qat,
    ffn_qat,
    qat_block_fns,
    weight_scale,
)


def int8_block_fns(int_params: dict, softmax_mode: str = "onepass"):
    """Build (attn_fn, ffn_fn) running the converted integer pipeline
    (quantize -> int8 golden path -> dequantize) inside the model forward;
    vmapped over the batch axis. ``softmax_mode``: 'onepass' or
    'streaming' (the hardware's partial softmax).

    IMPORTANT: call this *inside* your jitted function with int_params
    passed as a jit argument. Closing a jit over concrete device arrays
    embeds them as program constants, which some platforms (axon) re-
    upload on every call (~1000x slowdown observed).
    """

    def attn_fn(i, x):
        return jax.vmap(
            lambda s: ita_attention_f32(
                s, int_params["attn"][i], softmax_mode=softmax_mode
            )
        )(x)

    def ffn_fn(i, x):
        return jax.vmap(lambda s: ita_ffn_f32(s, int_params["ffn"][i]))(x)

    return attn_fn, ffn_fn


def int8_forward(
    cfg, params, int_params, frame, vel, quat, state=None,
    quantize_ffn=True, softmax_mode="onepass", **kw
):
    """Full-model forward with the integer attention/FFN path.

    jit this function directly (params AND int_params as arguments).
    ``quantize_ffn=False`` reproduces the reference's QAT_only_attn
    ablation (models/ITA_single_layer_upsample_shuffle/QAT_only_attn/
    model.py: attention int8, FFN float). ``softmax_mode='streaming'``
    runs the hardware's partial softmax (PyITA default)."""
    from ..models import vit_lstm as M

    attn_fn, ffn_fn = int8_block_fns(int_params, softmax_mode=softmax_mode)
    if not quantize_ffn:
        ffn_fn = None  # falls back to the float FFN inside forward
    return M.forward(
        cfg, params, frame, vel, quat, state, attn_fn=attn_fn, ffn_fn=ffn_fn, **kw
    )


def pallas_forward(
    cfg, params, int_params, frame, vel, quat, state=None, interpret=False,
    softmax_mode="onepass", **kw
):
    """Full-model forward with the fused Pallas encoder kernel (the
    TPU-accelerator path; one pallas_call per encoder layer keeps the
    whole quantized region in VMEM). jit with params/int_params as args.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    testing — the analog of the reference's x86 dummy-dispatch build).
    ``softmax_mode='streaming'`` runs the hardware partial softmax."""
    from ..models import vit_lstm as M
    from ..ops.pallas.ita_kernel import ita_encoder_block

    def encoder_fn(p, tokens):
        x = tokens
        for i in range(cfg.num_layers):
            blk = p["blocks"][i]
            x = ita_encoder_block(
                x,
                int_params["attn"][i],
                int_params["ffn"][i],
                blk["ln1"],
                blk["ln2"],
                interpret=interpret,
                softmax_mode=softmax_mode,
            )
        return x

    return M.forward(
        cfg, params, frame, vel, quat, state, encoder_fn=encoder_fn, **kw
    )


__all__ = [
    "int8_forward",
    "pallas_forward",
    "AttnObservers",
    "FFNObservers",
    "QATObservers",
    "attention_qat",
    "ffn_qat",
    "qat_block_fns",
    "weight_scale",
    "convert_attention",
    "convert_ffn",
    "convert_model",
    "calibrate_ptq",
    "int8_block_fns",
]
