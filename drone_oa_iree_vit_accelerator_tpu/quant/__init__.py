import jax
import jax.numpy as jnp

from ..ops.integer_ita import ita_attention_f32, ita_ffn_f32
from .calibrate import calibrate_histogram
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
    quantize_ffn=True, softmax_mode="onepass", glue_dtype=None, **kw
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
    if glue_dtype is not None:
        # bf16 float glue around the integer blocks — same deployment
        # demotion as pallas_forward(glue_dtype=...), reference
        # --iree-input-demote-f32-to-f16 analog. The integer blocks
        # dequantize to f32; cast back so the glue stays demoted.
        _af, _ff = attn_fn, ffn_fn
        attn_fn = lambda i, x: _af(i, x).astype(glue_dtype)
        if _ff is not None:
            ffn_fn = lambda i, x: _ff(i, x).astype(glue_dtype)
        if state is None:
            state = M.zero_state(cfg, frame.shape[0])
        demote = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(glue_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )
        cmd, st = M.forward(
            cfg, demote(params), demote(frame), demote(vel), demote(quat),
            demote(state), attn_fn=attn_fn, ffn_fn=ffn_fn, **kw
        )
        to32 = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), t
        )
        return to32(cmd), to32(st)
    return M.forward(
        cfg, params, frame, vel, quat, state, attn_fn=attn_fn, ffn_fn=ffn_fn, **kw
    )


def pallas_forward(
    cfg, params, int_params, frame, vel, quat, state=None, interpret=False,
    softmax_mode="onepass", glue_dtype=None, **kw
):
    """Full-model forward with the fused Pallas encoder kernel (the
    TPU-accelerator path; one pallas_call per encoder layer keeps the
    whole quantized region in VMEM). jit with params/int_params as args.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    testing — the analog of the reference's x86 dummy-dispatch build).
    ``softmax_mode='streaming'`` runs the hardware partial softmax.

    The float glue runs feature-last (encoder_layout="nhwc") — drop-in
    numerically (f32 reduction order only).

    ``glue_dtype=jnp.bfloat16`` demotes the FLOAT glue around the int8
    kernel (tokenizer conv/resize, fusion, decoder, LSTM, head) to bf16 —
    the TPU-native analog of the reference's deployment flag
    --iree-input-demote-f32-to-f16 (the whole model runs f16 on the A53,
    samples/inference_udp_FPGA_custom_dispatch/CMakeLists.txt:15-33). The
    integer region is bit-identical either way; outputs return as f32.
    """
    import jax as _jax

    from ..models import vit_lstm as M
    from ..ops.pallas.ita_kernel import ita_encoder_block

    if jnp.ndim(int_params["attn"][0].q.mult) != 0:
        raise ValueError(
            "pallas_forward requires per-tensor int_params (scalar "
            "mult/shift): the kernel packs requant params as SMEM scalars "
            "and the ITA hardware requantizes per-tensor. Per-channel "
            "weights (calibrate_ptq(per_channel=True)) run through "
            "int8_forward."
        )

    def encoder_fn(p, tokens):
        # Feature-last (NHWC) tokenizer/fusion around standard (B, S, E)
        # kernel blocks: keeps channels in lanes end to end — without it,
        # XLA strands the tokenizer conv in a T(1,128) layout 15x slower
        # and inserts layout copies at the kernel boundary (measured).
        #
        # Layout anchor: XLA's layout assignment only rewrites the
        # tokenizer conv into its fast split-spatial form when the token
        # consumer is a matmul; a Pallas custom call is opaque to it and
        # strands the conv at T(1,128) (14.5 us vs 2 us at B=1,
        # measured). An identity matmul at HIGHEST precision restores the
        # matmul-consumer signal; numerically it is f32-faithful
        # (verified end-to-end equal on test inputs) and costs ~0.5 us.
        eye = jnp.eye(tokens.shape[-1], dtype=tokens.dtype)
        tokens = jax.lax.dot_general(
            tokens, eye, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        x = tokens.astype(jnp.float32)  # kernel blocks are f32
        for i in range(cfg.num_layers):
            blk = p["blocks"][i]
            ln1 = {k: v.astype(jnp.float32) for k, v in blk["ln1"].items()}
            ln2 = {k: v.astype(jnp.float32) for k, v in blk["ln2"].items()}
            x = ita_encoder_block(
                x,
                int_params["attn"][i],
                int_params["ffn"][i],
                ln1,
                ln2,
                interpret=interpret,
                softmax_mode=softmax_mode,
            )
        return x.astype(tokens.dtype)

    if glue_dtype is not None:
        if state is None:
            state = M.zero_state(cfg, frame.shape[0])
        demote = lambda t: _jax.tree_util.tree_map(
            lambda x: x.astype(glue_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            t,
        )
        cmd, st = M.forward(
            cfg, demote(params), demote(frame), demote(vel), demote(quat),
            demote(state), encoder_fn=encoder_fn,
            encoder_layout="nhwc", **kw
        )
        to32 = lambda t: _jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), t
        )
        return to32(cmd), to32(st)

    return M.forward(
        cfg, params, frame, vel, quat, state, encoder_fn=encoder_fn,
        encoder_layout="nhwc", **kw
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
    "calibrate_histogram",
    "int8_block_fns",
]
