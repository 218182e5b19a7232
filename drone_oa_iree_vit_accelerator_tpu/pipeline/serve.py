"""Serving engine: fused camera->command step + drop-in UDP server.

The reference's serve path (SURVEY.md section 3.4) is a C++ loop around the
IREE VM: unpack UDP packet, normalize, run .vmfb, post-process, reply,
carry LSTM state with a host-side f16->f32 bounce. Here the whole
numeric path — u8 normalize, resize, model (fused Pallas int8 encoder),
velocity post-processing — is ONE jitted XLA program; the LSTM state
never leaves the device; the UDP shell is the native C++ loop
(native/codec.cpp) with this engine bound as its frame callback.

Velocity post-processing (in-jit) mirrors reference
calculate_final_velocity (main.cpp:381-417): clip vx to [-1,1],
L2-normalize, scale by desired velocity, and floor vx near the start
line (pos_x < 2 -> vx = max(1, pos_x/2 * desired_vel)).
"""

from __future__ import annotations

import ctypes
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE, ModelConfig
from ..models import vit_lstm as M
from .. import quant as QZ
from . import wire

_MIN_X_VEL = 1.0
_CONTROL_THRESHOLD = 2.0
# Native UDP loops: consecutive callback failures tolerated before the
# loop stops and the exception propagates (ADVICE r3 — a dead engine
# must not spin silently; isolated malformed packets must not kill it).
_CB_FAIL_LIMIT = 64


def postprocess_velocity(
    cmd: jax.Array, desired_vel: jax.Array, pos_x: jax.Array
) -> jax.Array:
    """In-jit velocity command post-processing; cmd (3,)."""
    vx = jnp.clip(cmd[0], -1.0, 1.0)
    v = jnp.stack([vx, cmd[1], cmd[2]])
    norm = jnp.linalg.norm(v)
    v = jnp.where(norm > 0, v / norm, v) * desired_vel
    vx_floor = jnp.maximum(_MIN_X_VEL, pos_x / _CONTROL_THRESHOLD * desired_vel)
    vx_out = jnp.where(pos_x < _CONTROL_THRESHOLD, vx_floor, v[0])
    return jnp.stack([vx_out, v[1], v[2]])


def make_serving_step(
    cfg: ModelConfig, path: str = "pallas", softmax_mode: str = "onepass"
):
    """Build the single-frame serving function.

    step(params, int_params, image_u8(60,90), vel, pos_x, quat(4,), state)
      -> (cmd(3,), state)

    ``softmax_mode``: 'onepass' (default) or 'streaming' — the hardware's
    ITA_N=16 partial softmax (the PyITA verification default, reference
    tests/export_and_validation_W_B.py:527). Applies to the quantized
    paths (int8 / pallas / pallas_bf16 / mega); float paths ignore it.
    """
    if path == "pallas":
        # Off-TPU the Pallas kernel runs in the interpreter (the analog of
        # the reference's x86 dummy-dispatch test build).
        interp = jax.default_backend() != "tpu"
        fwd = lambda cfg, p, ip, f, v, q, s: QZ.pallas_forward(
            cfg, p, ip, f, v, q, s, interpret=interp,
            softmax_mode=softmax_mode,
        )
    elif path == "pallas_bf16":
        # THE deployment configuration: int8 Pallas encoder + bf16 float
        # glue — the TPU-native analog of the reference's deployed build
        # (f16-demoted model + int8 accelerator dispatch,
        # CMakeLists.txt:15-33 --iree-input-demote-f32-to-f16).
        interp = jax.default_backend() != "tpu"
        fwd = lambda cfg, p, ip, f, v, q, s: QZ.pallas_forward(
            cfg, p, ip, f, v, q, s, interpret=interp,
            glue_dtype=jnp.bfloat16, softmax_mode=softmax_mode,
        )
    elif path == "int8":
        fwd = lambda cfg, p, ip, f, v, q, s: QZ.int8_forward(
            cfg, p, ip, f, v, q, s, softmax_mode=softmax_mode
        )
    elif path == "f32":
        fwd = lambda cfg, p, ip, f, v, q, s: M.forward(cfg, p, f, v, q, s)
    elif path == "dummy":
        # DummyHardwareBlock analog (reference models/*/export/model.py:
        # 12-129): the accelerator region computes x+x — the placeholder
        # the reference's transform spec pattern-matches and replaces
        # with the external object. Here the same placeholder exports
        # through pipeline/aot.py, and the "swap" is re-exporting with a
        # real path (tools/export_variants.py demonstrates both halves).
        fwd = lambda cfg, p, ip, f, v, q, s: M.forward(
            cfg, p, f, v, q, s,
            attn_fn=lambda i, x: x + x,
            ffn_fn=lambda i, x: x + x,
        )
    elif path == "bf16":
        # Half-precision float path — the analog of the reference's
        # --iree-input-demote-f32-to-f16 (the whole model runs f16 on the
        # A53, CMakeLists.txt:15-33) including its per-step f16<->f32
        # hidden-state bounce (main.cpp:217-224); bf16 is the TPU-native
        # half format.
        def fwd(cfg, p, ip, f, v, q, s):
            to16 = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32
                else x,
                t,
            )
            cmd, st = M.forward(
                cfg, to16(p), to16(f), to16(v), to16(q), to16(s)
            )
            to32 = lambda t: jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32), t
            )
            return to32(cmd), to32(st)
    elif path == "mega":
        # Whole-model megakernel: tokenizer in XLA, then ONE pallas_call
        # for encoder+fusion+decoder+LSTM+head+postprocess. The params
        # slot carries the precomputed kernel-params pytree
        # (make_flagship_kernel_params for the PXSHUFFLE_UPSAMPLE
        # flagship, make_flatten_kernel_params for the three FLATTEN
        # variants); the int_params slot is unused (already baked in).
        from ..core.config import FusionKind
        from ..models import layers as L

        interp = jax.default_backend() != "tpu"
        flatten = cfg.fusion is FusionKind.FLATTEN
        if flatten:
            from ..ops.pallas.flatten_kernel import flatten_fused_step
        else:
            from ..ops.pallas.model_kernel import flagship_fused_step

        def mega_step(kp, _ip, image_u8, vel, pos_x, quat, state):
            frame = image_u8.astype(jnp.float32)[None, None, :, :] / 255.0
            # Conv + resize stay in XLA (their layouts are fast there —
            # moving them in-kernel measured 15 us of stranded-conv +
            # layout-copy cost); LN and everything downstream run in the
            # kernel. The state (L, 1, H) passes through unreshaped.
            tokens = L.tokenizer_preln_nhwc(frame, kp.tok, cfg)[0]  # (S, E)
            # Layout anchor (same trick as quant.pallas_forward): XLA only
            # rewrites the conv into its fast form when the consumer is a
            # matmul; the Pallas custom call is opaque to layout
            # assignment and strands the conv 15x slower.
            eye = jnp.eye(tokens.shape[-1], dtype=tokens.dtype)
            tokens = jax.lax.dot_general(
                tokens, eye, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            if flatten:
                cmd, h, c = flatten_fused_step(
                    kp, tokens, vel, pos_x, quat[None, :],
                    state.h, state.c, num_layers=cfg.num_layers,
                    heads=cfg.H, interpret=interp,
                    softmax_mode=softmax_mode,
                )
            else:
                cmd, h, c = flagship_fused_step(
                    kp, tokens, vel, pos_x, quat[None, :],
                    state.h, state.c, interpret=interp,
                    softmax_mode=softmax_mode,
                )
            return cmd, M.LSTMState(h, c)

        return jax.jit(mega_step, donate_argnums=(6,))
    else:
        raise ValueError(path)

    def step(params, int_params, image_u8, vel, pos_x, quat, state):
        frame = image_u8.astype(jnp.float32)[None, None, :, :] / 255.0
        cmd, new_state = fwd(
            cfg, params, int_params, frame, vel[None, None], quat[None, :], state
        )
        out = postprocess_velocity(cmd[0], vel, pos_x)
        return out, new_state

    # Donate the LSTM state: it is consumed and replaced every frame, so
    # XLA can update it in place (no per-frame state copy).
    return jax.jit(step, donate_argnums=(6,))


def make_vitfly_serving_step(vcfg=None, path: str = "int8"):
    """Single-frame serving step for the vitfly (upstream ITALSTM) family
    — the serving counterpart of the reference's alt export path
    (scripts/export_model.py CompiledITALSTM main/run_with_state entry
    points, :261-283), with the same wire semantics as the ITA family.

    step(params, vint_params, image_u8(60,90), vel, pos_x, quat, state)
      -> (cmd(3,), state)

    ``path``: 'pallas' runs the true integer attention pipeline with
    each block as ONE fused Pallas kernel (the deployed configuration,
    ops/pallas/vitfly_kernel.py); 'int8' the same integer arithmetic
    through plain XLA ops (golden cross-check); 'f32' the float
    EfficientSelfAttention model.
    """
    from ..models import vitfly as VF
    from ..quant.vitfly_qat import vitfly_int8_forward

    vcfg = vcfg or VF.VITFLY_LSTM
    if path == "pallas":
        interp = jax.default_backend() != "tpu"
        fwd = lambda p, vp, f, v, q, s: vitfly_int8_forward(
            vcfg, p, vp, f, v, q, s, use_kernel=True, interpret=interp
        )
    elif path == "int8":
        fwd = lambda p, vp, f, v, q, s: vitfly_int8_forward(
            vcfg, p, vp, f, v, q, s
        )
    elif path == "f32":
        fwd = lambda p, vp, f, v, q, s: VF.forward(vcfg, p, f, v, q, s)
    elif path == "mega":
        # Whole-model megakernel (ops/pallas/vitfly_model_kernel.py):
        # stage-1 patch conv in XLA (transposed im2col), then ONE
        # pallas_call for stages+fusion+decoder+LSTM+head+postprocess.
        # The params slot carries the precomputed kernel-params pytree
        # (make_vitfly_kernel_params); vint_params slot unused (baked).
        from ..ops.pallas.vitfly_model_kernel import (
            vitfly_fused_step,
            vitfly_tokens_preln_t,
        )

        interp = jax.default_backend() != "tpu"

        def vf_mega_step(kp, _vp, image_u8, vel, pos_x, quat, state):
            frame = image_u8.astype(jnp.float32)[None, None, :, :] / 255.0
            tokens_t = vitfly_tokens_preln_t(frame, kp.tok, vcfg)
            cmd, h, c = vitfly_fused_step(
                kp, tokens_t, vel, pos_x, quat[None, :],
                state.h, state.c, interpret=interp,
            )
            from ..models.vit_lstm import LSTMState

            return cmd, LSTMState(h, c)

        return jax.jit(vf_mega_step, donate_argnums=(6,))
    else:
        raise ValueError(path)

    def step(params, vint_params, image_u8, vel, pos_x, quat, state):
        frame = image_u8.astype(jnp.float32)[None, None, :, :] / 255.0
        cmd, new_state = fwd(
            params, vint_params, frame, vel[None, None], quat[None, :], state
        )
        out = postprocess_velocity(cmd[0], vel, pos_x)
        return out, new_state

    return jax.jit(step, donate_argnums=(6,))


def make_fused_serving_step(cfg: ModelConfig):
    """Two-kernel serving step: the entire model runs as [tokenizer+fusion
    XLA glue] + fused Pallas encoder kernel + fused Pallas tail kernel
    (decoder/LSTM/head/post-processing) — the minimum-launch-count
    deployment configuration.
    """
    from ..models import layers as L
    from ..ops.pallas.ita_kernel import ita_encoder_block
    from ..ops.pallas.tail_kernel import tail_fused

    # The tail kernel keeps the decoder weight VMEM-resident; the
    # flatten-fusion variants (decoder_in = S*E up to 16384 -> 32 MB f32)
    # exceed VMEM. Only the conv-fusion head fits.
    dec_bytes = cfg.decoder_in * cfg.decoder_out * 4
    if dec_bytes > 12 * 1024 * 1024:
        raise ValueError(
            f"{cfg.name}: decoder weight {dec_bytes/2**20:.0f} MiB exceeds "
            "VMEM; use make_serving_step(path='pallas') instead"
        )

    interp = jax.default_backend() != "tpu"

    def step(params, int_params, image_u8, vel, pos_x, quat, state):
        frame = image_u8.astype(jnp.float32)[None, None, :, :] / 255.0
        tokens = L.tokenizer_forward(frame, params["tokenizer"], cfg)
        x = tokens
        for i in range(cfg.num_layers):
            blk = params["blocks"][i]
            x = ita_encoder_block(
                x, int_params["attn"][i], int_params["ffn"][i],
                blk["ln1"], blk["ln2"], interpret=interp,
            )
        flat = M.fuse_tokens(cfg, params, x)  # (1, decoder_in)

        dec, head = params["decoder"], params["fc2"]
        if cfg.spectral_norm_decoder and "u" in dec:
            dec_w, _, _ = L.spectral_norm_weight(dec["w"], dec["u"], dec["v"])
            head_w, _, _ = L.spectral_norm_weight(head["w"], head["u"], head["v"])
        else:
            dec_w, head_w = dec["w"], head["w"]

        extra = jnp.concatenate([vel[None, None] / 10.0, quat[None, :]], axis=1)
        cmd, h, c = tail_fused(
            flat, extra, vel, pos_x, dec_w, dec["b"], params["lstm"],
            head_w, head["b"], state.h, state.c, interpret=interp,
        )
        return cmd[0], M.LSTMState(h, c)

    return jax.jit(step, donate_argnums=(6,))


def make_batched_serving_step(
    cfg: ModelConfig, path: str = "auto", softmax_mode: str = "onepass"
):
    """Batched camera->command serving step (throughput deployments —
    offline dataset replay, fleet-scale inference, sim rollouts).

    step(params, int_params, tail, frames_u8 (B,60,90), vel (B,),
         pos_x (B,), quat (B,4), state) -> (cmds (B,3), state)

    ``path='auto'`` routes to the MEASURED-best batched path per config
    (device-trace numbers, BENCH_r0*.json):

    - batch-1 serving should use ``ServingEngine``/``make_serving_step``
      (the megakernel, 14.9 us/frame) — this builder is for batch >> 1;
    - for kernel-supported configs (H == 1) the turbo pipeline with the
      batched Pallas int8 encoder (factored tokenizer GEMMs, fused
      encoder kernel with in-kernel pre-LN, precomposed tail GEMM);
    - H != 1 configs fall back to the turbo pipeline with the XLA int8
      encoder (the Pallas kernel is H=1-only; ita_encoder_block guard).

    ``tail`` is the precomposed fusion+decoder matrix
    (quant.batched.make_tail) — build once per deployment.
    """
    return _make_turbo_step(cfg, path, masked=False,
                            softmax_mode=softmax_mode)


def make_fleet_step(cfg: ModelConfig, path: str = "auto", mesh=None,
                    softmax_mode: str = "onepass"):
    """Fixed-capacity fleet serving step: one batched program serves up
    to `capacity` concurrent drones, each row an independent client with
    its own LSTM-state slot.

    step(params, int_params, tail, frames_u8 (C,60,90), vel (C,),
         pos_x (C,), quat (C,4), active (C,) bool, state(batch=C))
      -> (cmds (C,3), state)

    Rows with ``active=False`` (no frame arrived this tick / free slot)
    still flow through the batched math, but their recurrent state is
    MASKED BACK to its previous value, so an idle client's memory is
    untouched by the padding frames. Same measured-best turbo routing as
    make_batched_serving_step (one shared builder).

    ``mesh``: a 1-D ``parallel.make_mesh`` device mesh — the fleet's
    slot axis is sharded over it (the mesh size must divide capacity:
    each chip serves capacity/mesh.size slots) with zero cross-chip
    traffic per tick (per-drone serving is embarrassingly parallel DP;
    params replicate). One UDP front-end then drives a pod slice.
    """
    return _make_turbo_step(cfg, path, masked=True, mesh=mesh,
                            softmax_mode=softmax_mode)


def make_fleet_mega_step(cfg: ModelConfig, softmax_mode: str = "onepass"):
    """Fleet-capacity MEGAKERNEL serving step: the whole fleet's tick is
    ONE pallas launch + one weight stream (ops/pallas/model_kernel.
    flagship_fused_step_fleet). Same signature as make_fleet_step so
    FleetEngine can swap it in — but the params slot carries the
    precomputed FlagshipKernelParams (int_params/tail slots unused).

    Why: the turbo fleet tick at small capacity is launch-overhead-bound
    (capacity-8: 25.5 us for work the b1 megakernel shows is ~3 us of
    marginal compute); the megakernel already pays ONE fixed cost + one
    3.15 MB weight stream per launch, so folding all K slots into that
    single launch serves the fleet at nearly batch-1 latency."""
    from ..models import layers as L
    from ..ops.pallas.model_kernel import flagship_fused_step_fleet

    interp = jax.default_backend() != "tpu"

    def step(kp, _ip, _tail, frames_u8, vel, pos_x, quat, active, state):
        frames = frames_u8.astype(jnp.float32)[:, None, :, :] / 255.0
        tokens = L.tokenizer_preln_nhwc(frames, kp.tok, cfg)  # (K, S, E)
        # Layout anchor (see make_serving_step 'mega'): keep the conv in
        # XLA's fast form by giving it a matmul consumer.
        eye = jnp.eye(tokens.shape[-1], dtype=tokens.dtype)
        tokens = jax.lax.dot_general(
            tokens, eye, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        cmds, h, c = flagship_fused_step_fleet(
            kp, tokens, vel, pos_x, quat, state.h, state.c,
            interpret=interp, softmax_mode=softmax_mode,
        )
        m = active[None, :, None]
        return cmds, M.LSTMState(
            jnp.where(m, h, state.h), jnp.where(m, c, state.c)
        )

    return jax.jit(step, donate_argnums=(8,))


def make_fleet_fused_step(cfg: ModelConfig, softmax_mode: str = "onepass"):
    """Two-kernel fleet tick: tokenizer GEMMs -> transposed encoder
    kernel -> batched-rows tail kernel (decoder+LSTM+head+postprocess,
    per-row vel/pos_x). Same signature as make_fleet_step; the tail MUST
    be e-major (make_tail e_major=True — FleetEngine path='fused' builds
    it so).

    Why: the turbo fleet tick at small capacity is op-launch-bound (the
    XLA LSTM/head chain is ~15 tiny ops); the whole-model fleet
    megakernel measured NEGATIVE (its per-frame fusion loop serializes —
    docs/fleet_mega_report.json). This middle point keeps the fused
    encoder + fuses the entire tail into ONE launch with K-row GEMMs."""
    from ..models import layers as L
    from ..ops.pallas.ita_kernel import ita_encoder_block_T
    from ..ops.pallas.tail_kernel import tail_fused_rows

    interp = jax.default_backend() != "tpu"
    gd = jnp.bfloat16

    def step(params, int_params, tail, frames_u8, vel, pos_x, quat,
             active, state):
        k = frames_u8.shape[0]
        frames = frames_u8.astype(jnp.float32)[:, None, :, :] / 255.0
        xT = L.tokenizer_tokens_factored_T(
            frames, params["tokenizer"], cfg, dtype=gd
        ).astype(gd)
        for i in range(cfg.num_layers):
            blk = params["blocks"][i]
            xT = ita_encoder_block_T(
                xT, int_params["attn"][i], int_params["ffn"][i],
                blk["ln1"], blk["ln2"], seq=cfg.S, interpret=interp,
                softmax_mode=softmax_mode, max_nb=8,
                pre_ln=params["tokenizer"]["ln"] if i == 0 else None,
                out_dtype=gd if i == cfg.num_layers - 1 else None,
            )
        flat = (
            xT.reshape(cfg.E, k, cfg.S)
            .transpose(1, 0, 2)
            .reshape(k, cfg.E * cfg.S)
        )
        head = params["fc2"]
        if cfg.spectral_norm_decoder and "u" in head:
            head_w, _, _ = L.spectral_norm_weight(
                head["w"], head["u"], head["v"], update=False
            )
        else:
            head_w = head["w"]
        extra = jnp.concatenate(
            [vel[:, None] / 10.0, quat.astype(jnp.float32)], axis=1
        )
        cmds, h, c = tail_fused_rows(
            flat, extra, vel, pos_x, tail.w, tail.b,
            params["lstm"], head_w, head["b"], state.h, state.c,
            interpret=interp,
        )
        m = active[None, :, None]
        return cmds, M.LSTMState(
            jnp.where(m, h, state.h), jnp.where(m, c, state.c)
        )

    return jax.jit(step, donate_argnums=(8,))


def _make_turbo_step(cfg: ModelConfig, path: str, masked: bool, mesh=None,
                     softmax_mode: str = "onepass"):
    """Shared builder behind make_batched_serving_step (masked=False)
    and make_fleet_step (masked=True): one copy of the measured-best
    routing policy and the turbo step body; the fleet variant adds the
    active mask that gates recurrent-state updates."""
    from ..quant.batched import turbo_forward

    if path == "auto":
        path = "turbo" if cfg.H == 1 else "turbo_int8"
    # 'turbo' routes to the TRANSPOSED pipeline (encoder='pallas_T',
    # measured 916 -> 764 us/step at b1024 — docs/turbo_T_report.json);
    # build the tail with make_tail(..., e_major=True) to avoid the
    # per-call row-permute fallback. 'turbo_rm' keeps the row-major
    # pipeline — measured faster at SMALL batch (fleet capacity <= 16:
    # 25.4 vs 30.9 us at cap 8, docs/fleet_mega_report.json) where the
    # T-pipeline's producer/tail layout shims cost more than the
    # lane-occupancy win; pair it with a row-major tail.
    encoder = {
        "turbo": "pallas_T", "turbo_rm": "pallas", "turbo_int8": "int8",
    }[path]
    # Interpret-mode keys off where the step will RUN: the mesh's device
    # platform when sharded (a CPU dry-run mesh can coexist with a TPU
    # default backend), else the default backend.
    if mesh is not None:
        interp = any(d.platform != "tpu" for d in mesh.devices.flat)
    else:
        interp = jax.default_backend() != "tpu"

    def core(params, int_params, tail, frames_u8, vel, pos_x, quat, state):
        frames = frames_u8.astype(jnp.float32)[:, None, :, :] / 255.0
        kw = {"interpret": interp} if encoder.startswith("pallas") else {}
        kw["softmax_mode"] = softmax_mode
        cmd, new_state = turbo_forward(
            cfg, params, int_params, tail, frames, vel[:, None], quat,
            state, encoder=encoder, **kw,
        )
        out = jax.vmap(postprocess_velocity)(cmd, vel, pos_x)
        return out, new_state

    if not masked:
        return jax.jit(core, donate_argnums=(7,))

    def step(params, int_params, tail, frames_u8, vel, pos_x, quat,
             active, state):
        out, new_state = core(
            params, int_params, tail, frames_u8, vel, pos_x, quat, state
        )
        m = active[None, :, None]
        return out, M.LSTMState(
            jnp.where(m, new_state.h, state.h),
            jnp.where(m, new_state.c, state.c),
        )

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import BATCH_AXIS

        b = P(BATCH_AXIS)
        state_spec = M.LSTMState(
            P(None, BATCH_AXIS), P(None, BATCH_AXIS)
        )
        step = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), b, b, b, b, b, state_spec),
            out_specs=(b, state_spec),
            check_vma=False,
        )
    return jax.jit(step, donate_argnums=(8,))


class FleetEngine:
    """Multi-drone serving engine: one batched device program serves a
    fleet of up to ``capacity`` concurrent clients, each with its own
    recurrent-state slot.

    Why this exists (and why the reference can't do it): the reference's
    serve loop is one drone per device by construction — a C++ UDP loop
    around a batch-1 .vmfb with a single global LSTM state
    (main.cpp:143-148, SURVEY.md section 3.4). On TPU the batch-1 floor
    analysis (docs/kernel_attribution.json mega_b1_floor) shows a
    serving program costs ~12 us of fixed overhead regardless of work,
    so serving K drones in ONE batched program costs nearly the same
    wall latency as serving one — the fleet path turns the fixed cost
    into per-drone throughput instead of paying it K times.

    Slot lifecycle: a new client id gets a free slot with freshly zeroed
    LSTM state; a client idle for ``idle_reset_s`` is reclaimed (the
    per-trajectory state-reset analog of the reference's replay tools /
    serve_udp's idle watchdog). All clients in one ``process_batch``
    call share one device step.

    Measured on the v5e (device traces, distinct frames/call): fleet
    tick 25.8 / 34.2 / 47.2 us at capacity 8 / 16 / 32 = 3.2 / 2.1 /
    1.5 us of device time per drone — vs 14.9 us/frame on the
    single-drone megakernel — while per-drone tick latency stays 3
    orders of magnitude under the ~30 Hz camera rate.
    """

    def __init__(
        self,
        cfg: ModelConfig = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
        params: dict | None = None,
        int_params: dict | None = None,
        capacity: int = 8,
        path: str = "auto",
        checkpoint_dir: str | None = None,
        idle_reset_s: float = 2.0,
        mesh=None,
        softmax_mode: str = "onepass",
    ):
        from ..quant.batched import make_tail

        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        if mesh is not None and capacity % mesh.size != 0:
            raise ValueError(
                f"capacity {capacity} must divide evenly over the "
                f"{mesh.size}-device mesh (each chip serves "
                "capacity/mesh.size slots)"
            )
        self.cfg = cfg
        self.capacity = capacity
        self.idle_reset_s = idle_reset_s
        params, int_params = _resolve_params(
            cfg, params, int_params, checkpoint_dir
        )
        # Measured-best per-capacity routing (docs/fleet_mega_report.
        # json): small fleets are launch-bound and the row-major
        # pipeline wins (25.4 vs 30.9 us at capacity 8); at capacity
        # >= 32 the transposed pipeline's lane-occupancy win takes over
        # (44.0 vs 45.7 us).
        if path in ("auto", "turbo") and cfg.H == 1 and capacity <= 16:
            path = "turbo_rm"
        # e-major tail: the 'turbo'/'fused' routes run the transposed
        # pipeline.
        self.tail = make_tail(
            cfg, params,
            e_major=(path in ("auto", "turbo", "fused") and cfg.H == 1),
        )
        if path == "fused":
            # Two-kernel tick: T-encoder kernel + batched-rows tail
            # kernel (decoder/LSTM/head/postprocess in one launch).
            if mesh is not None:
                raise ValueError("path='fused' does not support mesh=")
            if cfg.H != 1:
                raise ValueError(
                    "path='fused' needs the Pallas encoder (H == 1), "
                    f"got {cfg.name}"
                )
            if cfg.S * cfg.E * cfg.decoder_out * 2 > 12 * 1024 * 1024:
                raise ValueError(
                    f"{cfg.name}: bf16 tail exceeds the tail kernel's "
                    "VMEM budget; use path='turbo'"
                )
            self.params = M.freeze_for_inference(cfg, params)
            self.int_params = int_params
            self.step = make_fleet_fused_step(
                cfg, softmax_mode=softmax_mode
            )
        elif path == "mega":
            # Whole-fleet megakernel: one launch + one weight stream per
            # tick (flagship config only; the kernel's conv-output planes
            # need capacity % 8 == 0; per-slot DP sharding unsupported —
            # the kernel IS the whole fleet).
            from ..core.config import FusionKind
            from ..ops.pallas.model_kernel import (
                make_flagship_kernel_params,
            )

            if mesh is not None:
                raise ValueError("path='mega' does not support mesh=")
            if cfg.fusion is not FusionKind.PXSHUFFLE_UPSAMPLE or cfg.H != 1:
                raise ValueError(
                    f"path='mega' fleet serving supports the flagship "
                    f"config only, got {cfg.name}"
                )
            if capacity % 8 != 0:
                raise ValueError(
                    f"path='mega' needs capacity % 8 == 0, got {capacity}"
                )
            self.params = make_flagship_kernel_params(
                cfg, params, int_params
            )
            self.int_params = int_params
            self.step = make_fleet_mega_step(cfg, softmax_mode=softmax_mode)
        else:
            self.params = M.freeze_for_inference(cfg, params)
            self.int_params = int_params
            self.step = make_fleet_step(
                cfg, path, mesh=mesh, softmax_mode=softmax_mode
            )
        self.state = M.zero_state(cfg, capacity)
        self.slots: dict = {}       # client id -> slot index
        self.last_seen: dict = {}   # client id -> monotonic seconds
        self.frames = 0
        # Last-seen values per slot — templates copied into fresh
        # per-tick arrays in process_batch, never handed to JAX
        # directly: device_put of a numpy array can be ZERO-COPY on the
        # CPU backend (even via jnp.array), so a buffer JAX might alias
        # must never be mutated afterwards.
        self._imgs = np.zeros((capacity,) + wire.IMAGE_SHAPE, np.uint8)
        self._vel = np.zeros((capacity,), np.float32)
        self._posx = np.zeros((capacity,), np.float32)
        self._quat = np.zeros((capacity, 4), np.float32)
        self._quat[:, 0] = 1.0

    def warmup(self) -> None:
        active = np.zeros((self.capacity,), bool)
        cmds, _ = self.step(
            self.params, self.int_params, self.tail,
            jnp.array(self._imgs.copy()), jnp.array(self._vel.copy()),
            jnp.array(self._posx.copy()), jnp.array(self._quat.copy()),
            jnp.array(active), M.zero_state(self.cfg, self.capacity),
        )
        np.asarray(cmds)  # absorb the first (slow) D2H here

    def _plan_slots(self, clients: list, now: float) -> tuple[dict, set]:
        """Resolve a slot for every client WITHOUT mutating engine state
        — the atomicity barrier: if the batch doesn't fit, this raises
        before any reclaim/zeroing/staging has happened. Returns
        ({client: (slot, is_new)}, stale_client_ids); idle assignments
        (older than idle_reset_s) count as free and are reclaimed by the
        caller on commit."""
        stale = {
            cid for cid, seen in self.last_seen.items()
            if now - seen > self.idle_reset_s
        }
        live = {c: s for c, s in self.slots.items() if c not in stale}
        plan = {}
        free = iter(
            i for i in range(self.capacity) if i not in set(live.values())
        )
        for client in clients:
            if client in plan:
                continue
            if client in live:
                plan[client] = (live[client], False)
                continue
            slot = next(free, None)
            if slot is None:
                raise RuntimeError(
                    f"fleet at capacity ({self.capacity}): no free slot "
                    f"for {client!r}; raise capacity= or wait for idle "
                    "reclaim"
                )
            live[client] = slot
            plan[client] = (slot, True)  # fresh slot: zero its state
        return plan, stale

    def process_batch(self, items: list) -> dict:
        """Serve one tick: ``items`` is [(client_id, wire.Frame), ...]
        (at most one frame per client per tick; duplicate client ids keep
        the last frame). Returns {client_id: np.ndarray cmd (3,)}.
        One device step regardless of len(items). All-or-nothing: a
        capacity overflow raises BEFORE any slot/state/staging mutation."""
        now = time.monotonic()
        plan, stale = self._plan_slots([c for c, _ in items], now)
        # Commit: reclaim stale ids, zero freshly allocated state slots.
        for cid in stale:
            self.slots.pop(cid, None)
            self.last_seen.pop(cid, None)
        new_slots = [slot for slot, is_new in plan.values() if is_new]
        if new_slots:
            h, c = self.state
            for slot in new_slots:
                h = h.at[:, slot].set(0.0)
                c = c.at[:, slot].set(0.0)
            self.state = M.LSTMState(h, c)
        active = np.zeros((self.capacity,), bool)
        row_of = {}
        for client, frame in items:
            slot = plan[client][0]
            self.slots[client] = slot
            self.last_seen[client] = now
            self._imgs[slot] = frame.image
            self._vel[slot] = frame.desired_velocity
            self._posx[slot] = frame.position_x
            self._quat[slot] = frame.quaternion
            active[slot] = True
            row_of[client] = slot
        # Fresh .copy() arrays every tick: device_put of numpy can be
        # zero-copy on CPU, so JAX must get buffers nobody writes again.
        try:
            cmds, self.state = self.step(
                self.params, self.int_params, self.tail,
                jnp.array(self._imgs.copy()), jnp.array(self._vel.copy()),
                jnp.array(self._posx.copy()), jnp.array(self._quat.copy()),
                jnp.array(active), self.state,
            )
        except Exception:
            # The step donates self.state; if the step itself failed
            # (device OOM, transient runtime error) the donated buffer
            # may already be deleted, which would otherwise brick every
            # later tick. Rebuild fresh state so the serve loops'
            # drop-the-tick-and-keep-serving contract also covers step
            # errors (ADVICE r3). In-flight LSTM state is lost — the
            # same reset a reclaimed slot gets.
            if any(
                getattr(a, "is_deleted", lambda: False)()
                for a in (self.state.h, self.state.c)
            ):
                self.state = M.zero_state(self.cfg, self.capacity)
            raise
        self.frames += len(row_of)
        out = np.asarray(cmds)
        return {client: out[slot] for client, slot in row_of.items()}


def serve_udp_fleet(
    engine: FleetEngine,
    port: int = 10001,
    stop_flag=None,
    batch_window_s: float = 0.002,
    port_out: list | None = None,
) -> int:
    """UDP fleet server: multiple sim clients (distinguished by source
    address) share one TPU through batched steps.

    Loop: block on the first packet, then drain whatever else arrives
    within ``batch_window_s`` (up to capacity), run ONE batched step,
    reply to every sender. The wire format per client is byte-identical
    to the single-drone server (5424 B request / 12 B reply). Python
    socket loop (the native C++ loop is per-packet; fleet batching needs
    drain-and-batch semantics). The drain waits in select(), never
    busy-spins — this host has one core and a hot loop starves the TPU
    relay client. A serving error (e.g. fleet-at-capacity from a stray
    source address — any 5424-byte datagram parses as a frame) drops
    that tick and keeps serving, like the single-drone loop's callback.

    ``port=0`` binds an ephemeral port; ``port_out`` (a list), when
    given, receives the actual bound port before serving starts.
    Returns frames served.
    """
    import select
    import socket

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("0.0.0.0", port))
    if port_out is not None:
        port_out.append(sock.getsockname()[1])
    sock.settimeout(0.2)
    engine.warmup()
    try:
        while stop_flag is None or not stop_flag[0]:
            try:
                packet, addr = sock.recvfrom(8192)
            except socket.timeout:
                continue
            batch = {}
            try:
                batch[addr] = wire.unpack_frame(packet)
            except ValueError:
                continue
            deadline = time.monotonic() + batch_window_s
            while len(batch) < engine.capacity:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                ready, _, _ = select.select([sock], [], [], remaining)
                if not ready:
                    break
                packet, addr = sock.recvfrom(8192)
                try:
                    batch[addr] = wire.unpack_frame(packet)
                except ValueError:
                    pass
            try:
                replies = engine.process_batch(list(batch.items()))
            except RuntimeError:
                # At capacity (stray source address): still serve the
                # clients that already hold slots this tick.
                known = [
                    (a, f) for a, f in batch.items() if a in engine.slots
                ]
                if not known:
                    continue
                try:
                    replies = engine.process_batch(known)
                except RuntimeError:
                    continue
            for addr, cmd in replies.items():
                sock.sendto(wire.pack_reply(cmd), addr)
    finally:
        sock.close()
    return engine.frames


def serve_udp_fleet_native(
    engine: FleetEngine,
    port: int = 10001,
    stop_flag=None,
    batch_window_s: float = 0.002,
    port_out: list | None = None,
) -> int:
    """Native (C++) fleet UDP loop: the socket loop, per-tick batching
    (drain window, per-peer last-frame dedupe, short-packet drops) and
    reply fan-out run in native code (native/codec.cpp
    doa_udp_serve_fleet) — the fleet counterpart of serve_udp's native
    shell, mirroring the reference's C++ server around the model step
    (reference main.cpp). Python is entered once per TICK (not per
    packet) with the whole batch.

    Same semantics as serve_udp_fleet: clients keyed by source address,
    capacity-overflow ticks degrade to the known-client subset, wire
    format per client byte-identical to the single-drone server.
    ``stop_flag`` is a ctypes c_int (like serve_udp). ``port=0`` binds an
    ephemeral port, reported via ``port_out``.
    """
    from .. import native

    lib = native.load()
    engine.warmup()
    if stop_flag is None:
        stop_flag = ctypes.c_int(0)
    req = native.REQUEST_SIZE
    fail = {"consecutive": 0, "exc": None}

    @native.BATCH_CB
    def cb(packets_ptr, peers_ptr, n, replies_ptr, send_ok_ptr, _user):
        try:
            raw = ctypes.string_at(packets_ptr, n * req)
            items = []
            for i in range(n):
                frame = wire.unpack_frame(raw[i * req : (i + 1) * req])
                items.append((int(peers_ptr[i]), frame))
            try:
                replies = engine.process_batch(items)
            except RuntimeError:
                known = [
                    (cid, f) for cid, f in items if cid in engine.slots
                ]
                if not known:
                    return 1
                replies = engine.process_batch(known)
            for i in range(n):
                cmd = replies.get(int(peers_ptr[i]))
                if cmd is None:
                    continue
                reply = wire.pack_reply(cmd)
                ctypes.memmove(
                    ctypes.byref(replies_ptr.contents, i * native.REPLY_SIZE),
                    reply, native.REPLY_SIZE,
                )
                send_ok_ptr[i] = 1
            fail["consecutive"] = 0
            return 0
        except Exception as e:
            # Same persistent-failure escalation as serve_udp: dropped
            # ticks are survivable, a dead engine is not — stop + raise
            # rather than spin silently (ADVICE r3).
            fail["consecutive"] += 1
            fail["exc"] = e
            if fail["consecutive"] >= _CB_FAIL_LIMIT:
                stop_flag.value = 1
            return 1  # drop the tick, keep serving

    bound = ctypes.c_int(0)
    window_us = max(int(batch_window_s * 1e6), 0)
    # The blocking native call writes the bound port into ``bound`` right
    # after bind(). A small watcher thread polls that int and publishes it
    # to ``port_out`` so callers can learn the ephemeral port while this
    # function is still blocked in the C loop. The watcher deadline stops
    # the poll if the native loop exits early (e.g. bind error).
    import threading

    if port_out is not None:
        def _watch():
            # Bounded: if the native loop exits early (bind error), stop
            # polling instead of spinning for the process lifetime.
            deadline = time.monotonic() + 600.0
            while (bound.value == 0 and not stop_flag.value
                   and time.monotonic() < deadline):
                time.sleep(0.005)
            if bound.value:
                port_out.append(bound.value)

        threading.Thread(target=_watch, daemon=True).start()
    rc = lib.doa_udp_serve_fleet(
        port, engine.capacity, window_us, cb, None,
        ctypes.byref(stop_flag), ctypes.byref(bound),
    )
    if fail["consecutive"] >= _CB_FAIL_LIMIT:
        raise RuntimeError(
            f"serve_udp_fleet_native: engine callback failed "
            f"{fail['consecutive']}x consecutively; serving stopped"
        ) from fail["exc"]
    if rc < 0:
        import os

        raise OSError(-rc, f"native fleet UDP loop failed: "
                           f"{os.strerror(-rc)}")
    return rc


class ServingEngine:
    """Stateful frame server: holds params and the device-resident LSTM
    state across frames (reset per trajectory like the reference's
    per-trajectory state reset)."""

    def __init__(
        self,
        cfg: ModelConfig = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
        params: dict | None = None,
        int_params: dict | None = None,
        path: str = "auto",
        checkpoint_dir: str | None = None,
        softmax_mode: str = "onepass",
    ):
        # "auto": the whole-model megakernel where a config-matching
        # kernel exists — the flagship (model_kernel) or any FLATTEN
        # variant (flatten_kernel) — else the per-layer Pallas path.
        if path == "auto":
            flagship_ok = (
                cfg.num_layers == 1 and cfg.H == 1
                and (cfg.S, cfg.E) == (128, 64)
                and cfg.fusion.name == "PXSHUFFLE_UPSAMPLE"
            )
            flatten_ok = (
                cfg.fusion.name == "FLATTEN"
                and (cfg.S * cfg.E) % 2048 == 0
            )
            path = "mega" if (flagship_ok or flatten_ok) else "pallas"
        self.cfg = cfg
        params, int_params = _resolve_params(
            cfg, params, int_params, checkpoint_dir
        )
        # Bake inference-constant transforms (spectral norm) into the
        # weights once — identical numerics, ~6 us/frame less device work.
        self.params = M.freeze_for_inference(cfg, params)
        self.int_params = int_params
        if path == "mega":
            # The megakernel consumes one precomputed operand pytree in
            # the params slot (weights int8/bf16, fusion folded to
            # matmuls); the builder matches the config's fusion kind.
            from ..core.config import FusionKind

            if cfg.fusion is FusionKind.FLATTEN:
                from ..ops.pallas.flatten_kernel import (
                    make_flatten_kernel_params,
                )

                self.params = make_flatten_kernel_params(
                    cfg, params, int_params
                )
            else:
                from ..ops.pallas.model_kernel import (
                    make_flagship_kernel_params,
                )

                self.params = make_flagship_kernel_params(
                    cfg, params, int_params
                )
        self.softmax_mode = softmax_mode
        self.step = make_serving_step(cfg, path, softmax_mode=softmax_mode)
        self.state = M.zero_state(cfg, 1)
        self.frames = 0

    def reset(self) -> None:
        self.state = M.zero_state(self.cfg, 1)

    def warmup(self) -> None:
        img = jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8)
        # Fresh throwaway state: the step donates (deletes) its state
        # argument, and self.state must stay alive for the first frame.
        cmd, _ = self.step(
            self.params, self.int_params, img, jnp.float32(1.0),
            jnp.float32(5.0), jnp.zeros((4,), jnp.float32),
            M.zero_state(self.cfg, 1),
        )
        # Absorb the first device-to-host transfer here: on the axon
        # platform the process's FIRST D2H takes minutes (relay transport
        # switch); every later one is instant. Real TPU hosts: microseconds.
        np.asarray(cmd)

    def process(self, frame: wire.Frame) -> np.ndarray:
        cmd, self.state = self.step(
            self.params,
            self.int_params,
            jnp.asarray(frame.image),
            jnp.float32(frame.desired_velocity),
            jnp.float32(frame.position_x),
            jnp.asarray(frame.quaternion),
            self.state,
        )
        self.frames += 1
        return np.asarray(cmd)

    def handle_packet(self, packet: bytes) -> bytes:
        return wire.pack_reply(self.process(wire.unpack_frame(packet)))


def serve_udp(
    engine: ServingEngine,
    port: int = 10001,
    stop_flag=None,
    reset_after_idle_s: float | None = 2.0,
) -> int:
    """Run the native C++ UDP loop with the engine as frame callback.

    Blocks until *stop_flag (a ctypes c_int) becomes nonzero. Returns the
    number of frames served.

    ``reset_after_idle_s``: watchdog analog of the reference's rollout
    supervision (launch_evaluation_FPGA.bash:139-153 kills and relaunches
    hung rollouts; the replay tools reset LSTM state per trajectory). A
    gap in the frame stream longer than this marks a trajectory boundary
    and resets the recurrent state, so a crashed/restarted sim doesn't
    resume against stale memory. ``None`` disables.
    """
    from .. import native

    lib = native.load()
    engine.warmup()
    if stop_flag is None:
        stop_flag = ctypes.c_int(0)
    last_frame = [0.0]

    fail = {"consecutive": 0, "exc": None}

    @native.FRAME_CB
    def cb(packet_ptr, length, reply_ptr, _user):
        try:
            now = time.monotonic()
            if (
                reset_after_idle_s is not None
                and last_frame[0] > 0.0
                and now - last_frame[0] > reset_after_idle_s
            ):
                engine.reset()
            last_frame[0] = now
            packet = ctypes.string_at(packet_ptr, length)
            reply = engine.handle_packet(packet)
            ctypes.memmove(reply_ptr, reply, len(reply))
            fail["consecutive"] = 0
            return 0
        except Exception as e:
            # A malformed packet is expected noise; a PERSISTENTLY
            # failing engine (device gone, params corrupted) is not —
            # stop the native loop and surface the cause instead of
            # silently dropping every frame forever (ADVICE r3:
            # native-loop death propagation to the spawning Python).
            fail["consecutive"] += 1
            fail["exc"] = e
            if fail["consecutive"] >= _CB_FAIL_LIMIT:
                stop_flag.value = 1
            return 1  # drop this packet

    rc = lib.doa_udp_serve(port, cb, None, ctypes.byref(stop_flag))
    if fail["consecutive"] >= _CB_FAIL_LIMIT:
        raise RuntimeError(
            f"serve_udp: engine callback failed {fail['consecutive']}x "
            "consecutively; serving stopped"
        ) from fail["exc"]
    if rc < 0:
        import os

        raise OSError(-rc, f"native UDP loop failed: {os.strerror(-rc)}")
    return rc


def _resolve_params(
    cfg: ModelConfig,
    params: dict | None,
    int_params: dict | None,
    checkpoint_dir: str | None,
) -> tuple[dict, dict]:
    """Shared engine parameter resolution (ServingEngine + FleetEngine):
    load a checkpoint when given, refuse random-init weights behind a
    checkpoint_dir (serving an untrained policy's flight commands
    silently would be dangerous), and calibrate int8 scales on
    sim-rendered frames — loudly — when the checkpoint ships none."""
    if params is None:
        params = M.init_params(cfg, jax.random.PRNGKey(0))
        if checkpoint_dir is not None:
            from ..models import params_io
            import pathlib

            ckpt = pathlib.Path(checkpoint_dir)
            if not (ckpt / "model_float.npz").exists():
                raise FileNotFoundError(
                    f"checkpoint_dir={checkpoint_dir!r} has no "
                    "model_float.npz — refusing to serve random-init "
                    "weights; pass checkpoint_dir=None (and params=...) "
                    "to opt in explicitly"
                )
            params = params_io.load_params(
                str(ckpt / "model_float.npz"), params
            )
            if int_params is None:
                if (ckpt / "model_int8.npz").exists():
                    int_params = params_io.load_params(
                        str(ckpt / "model_int8.npz"),
                        _calibrate_random(cfg, params),
                    )
                else:
                    # A trained checkpoint without int8 scales: random
                    # frames would give the int8/pallas paths junk
                    # activation scales under real weights. Calibrate
                    # on sim-rendered depth frames (the flight input
                    # distribution) and say so loudly.
                    import sys as _sys

                    print(
                        f"WARNING: {ckpt}/model_int8.npz missing — "
                        "PTQ-calibrating int8 scales at engine build "
                        "from sim-rendered depth frames; ship a "
                        "model_int8.npz (scripts/qat_deploy.py) for "
                        "deployed-quality scales",
                        file=_sys.stderr,
                    )
                    int_params = _calibrate_sim_frames(cfg, params)
    if int_params is None:
        int_params = _calibrate_random(cfg, params)
    return params, int_params


def _calibrate_sim_frames(cfg: ModelConfig, params: dict) -> dict:
    """PTQ-calibrate on sim-rendered depth frames: sample obstacle worlds
    and ray-cast frames from several along-track positions — the input
    distribution the policy actually flies in (sim/world.render_depth),
    unlike uniform-random pixels whose activation statistics are junk
    under trained weights (VERDICT r2 weak item 6)."""
    from ..sim import world as W

    wcfg = W.WorldConfig()
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    frames = []
    for k in keys:
        w = W.sample_world(k, wcfg)
        for x in (0.0, wcfg.goal_x * 0.3, wcfg.goal_x * 0.6):
            pos = jnp.asarray([x, 0.0, 0.0])
            frames.append(W.render_depth(w, pos, wcfg))
    frames_u8 = jnp.stack(frames)[:, None, :, :]  # (N, 1, 60, 90) u8
    int_params, _ = QZ.calibrate_ptq(cfg, params, frames_u8)
    return int_params


def _calibrate_random(cfg: ModelConfig, params: dict) -> dict:
    """Calibrate observers on random frames through the REAL forward pass
    and convert (used when no int8 checkpoint is supplied; real deployments
    load trained scales). Running the full model — rather than feeding one
    raw tensor to each block's observers — threads activations correctly:
    the FFN observers see attention output, layer i>0 sees layer i-1."""
    frames = jax.random.randint(
        jax.random.PRNGKey(1), (8, 1, 60, 90), 0, 256, jnp.uint8
    )
    int_params, _ = QZ.calibrate_ptq(cfg, params, frames)
    return int_params


def _demo(n_frames: int = 50, port: int = 10001, checkpoint_dir=None) -> None:
    """Loopback round-trip demo: spin up the server in a thread, drive it
    with synthetic frames through a real UDP socket, print latency."""
    import socket
    import threading

    engine = ServingEngine(checkpoint_dir=checkpoint_dir)
    print("compiling serving step...")
    engine.warmup()  # compile before opening the socket (slow on axon)
    stop = ctypes.c_int(0)
    t = threading.Thread(target=serve_udp, args=(engine, port, stop), daemon=True)
    t.start()
    time.sleep(0.3)

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.settimeout(30.0)
    rng = np.random.default_rng(0)
    lat = []
    for i in range(n_frames):
        img = rng.integers(0, 256, wire.IMAGE_SHAPE, np.uint8)
        pkt = wire.pack_frame(img, 5.0, float(i) * 0.5, [1, 0, 0, 0])
        t0 = time.perf_counter()
        sock.sendto(pkt, ("127.0.0.1", port))
        reply, _ = sock.recvfrom(64)
        lat.append(time.perf_counter() - t0)
        if i < 3 or i == n_frames - 1:
            print(f"frame {i}: cmd={wire.unpack_reply(reply)}")
    stop.value = 1
    t.join(timeout=2)
    lat.sort()
    print(
        f"served {n_frames} frames over UDP: p50 "
        f"{lat[len(lat)//2]*1e3:.3f} ms, p99 {lat[int(len(lat)*.99)]*1e3:.3f} ms"
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--port", type=int, default=10001)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument(
        "--backend", default=None,
        help="force a jax backend (e.g. cpu) before any device use",
    )
    ap.add_argument(
        "--checkpoints", default="checkpoints",
        help="directory with model_float.npz / model_int8.npz",
    )
    ap.add_argument(
        "--random-init", action="store_true",
        help="explicitly allow serving random-init weights (demo/testing)",
    )
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    import pathlib
    import sys

    ckpt_dir = args.checkpoints
    if not pathlib.Path(ckpt_dir, "model_float.npz").exists():
        if args.demo or args.random_init:
            print(
                f"WARNING: no model_float.npz in {ckpt_dir!r} — serving "
                "RANDOM-INIT weights (untrained policy, demo only)",
                file=sys.stderr,
            )
            ckpt_dir = None
        else:
            sys.exit(
                f"error: no model_float.npz in {ckpt_dir!r}; train a policy "
                "first (scripts/train_demo_policy.py) or pass --random-init"
            )
    if args.demo:
        _demo(args.frames, args.port, checkpoint_dir=ckpt_dir)
    else:
        print(f"serving on UDP :{args.port} (ctrl-c to stop)")
        serve_udp(ServingEngine(checkpoint_dir=ckpt_dir), args.port)
