"""Fused Pallas kernel for the model tail: decoder -> LSTM -> head.

Covers everything after token fusion in one VMEM-resident kernel
(reference model.py:125-138 — decoder, feature concat, 3-layer LSTM,
output head — plus the serve loop's velocity post-processing,
main.cpp:381-417):

    flat (B,4608) -> spectral-normed decoder (4608x512)
      -> concat [dec, vel/10, quat] (517) -> LSTM x3 (torch gate order)
      -> head (128x3) -> clip/normalize/scale/pos_x-floor -> cmd (B,3)

The decoder weight (4608x512 f32 ~ 9.4 MB) plus LSTM weights (~1.6 MB)
stay resident in VMEM; at batch 1 this replaces ~10 XLA fusions (each a
kernel-launch + HBM round trip) with one launch. Spectral normalization
is applied to the weights *outside* (a cheap matvec; the kernel takes
pre-normalized weights).

Numerics are identical to models/layers.lstm_forward +
pipeline/serve.postprocess_velocity (eval mode, no dropout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tail_kernel(
    pp_ref,      # SMEM (1, 2) f32: [desired_vel, pos_x]
    flat_ref,    # VMEM (1, Dflat) f32
    extra_ref,   # VMEM (1, 5) f32: [vel/10, quat]
    wdec_ref, bdec_ref,          # (Dflat, 512), (1, 512)
    wih0a_ref, wih0b_ref,        # (512, 4H), (5, 4H)  — layer-0 input split
    whh0_ref, b0_ref,            # (H, 4H), (1, 4H)    — b_ih + b_hh folded
    wih1_ref, whh1_ref, b1_ref,  # (H, 4H), (H, 4H), (1, 4H)
    wih2_ref, whh2_ref, b2_ref,
    whead_ref, bhead_ref,        # (H, 3), (1, 3)
    h_ref, c_ref,                # VMEM (1, L, H) f32
    cmd_ref,     # out VMEM (1, 3)
    h_out_ref, c_out_ref,        # out VMEM (1, L, H)
):
    f32 = jnp.float32

    dec = (
        jnp.dot(flat_ref[0][None, :], wdec_ref[:], preferred_element_type=f32)
        + bdec_ref[0]
    )  # (1, 512)

    def cell(gates, h, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    # Layer 0: input = [dec(512), extra(5)] with the weight split to avoid
    # an in-kernel concat on a 517-wide (unaligned) axis.
    g0 = (
        jnp.dot(dec, wih0a_ref[:], preferred_element_type=f32)
        + jnp.dot(extra_ref[:], wih0b_ref[:], preferred_element_type=f32)
        + jnp.dot(h_ref[0, 0][None, :], whh0_ref[:], preferred_element_type=f32)
        + b0_ref[0]
    )
    h0, c0 = cell(g0, h_ref[0, 0][None, :], c_ref[0, 0][None, :])

    g1 = (
        jnp.dot(h0, wih1_ref[:], preferred_element_type=f32)
        + jnp.dot(h_ref[0, 1][None, :], whh1_ref[:], preferred_element_type=f32)
        + b1_ref[0]
    )
    h1, c1 = cell(g1, h_ref[0, 1][None, :], c_ref[0, 1][None, :])

    g2 = (
        jnp.dot(h1, wih2_ref[:], preferred_element_type=f32)
        + jnp.dot(h_ref[0, 2][None, :], whh2_ref[:], preferred_element_type=f32)
        + b2_ref[0]
    )
    h2, c2 = cell(g2, h_ref[0, 2][None, :], c_ref[0, 2][None, :])

    cmd = jnp.dot(h2, whead_ref[:], preferred_element_type=f32) + bhead_ref[0]

    # Velocity post-processing (serve.postprocess_velocity).
    desired_vel = pp_ref[0, 0]
    pos_x = pp_ref[0, 1]
    vx = jnp.clip(cmd[0, 0], -1.0, 1.0)
    vy, vz = cmd[0, 1], cmd[0, 2]
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    scale = jnp.where(norm > 0, desired_vel / norm, desired_vel)
    vx_n, vy_n, vz_n = vx * scale, vy * scale, vz * scale
    vx_floor = jnp.maximum(1.0, pos_x / 2.0 * desired_vel)
    vx_out = jnp.where(pos_x < 2.0, vx_floor, vx_n)
    cmd_ref[0] = jnp.concatenate(
        [vx_out[None], vy_n[None], vz_n[None]]
    )

    h_out_ref[0] = jnp.concatenate([h0, h1, h2], axis=0)
    c_out_ref[0] = jnp.concatenate([c0, c1, c2], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tail_fused(
    flat: jax.Array,        # (B, Dflat) f32
    extra: jax.Array,       # (B, 5) f32 = [vel/10, quat]
    desired_vel: jax.Array,  # scalar f32
    pos_x: jax.Array,        # scalar f32
    dec_w: jax.Array,        # (Dflat, 512) pre-spectral-normalized
    dec_b: jax.Array,
    lstm: tuple,             # 3 dicts: w_ih/w_hh/b_ih/b_hh (torch order)
    head_w: jax.Array,       # (H, 3) pre-spectral-normalized
    head_b: jax.Array,
    h: jax.Array,            # (L, B, H)
    c: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (cmd (B,3) post-processed, h', c')."""
    b, dflat = flat.shape
    hid = h.shape[-1]
    pp = jnp.stack([desired_vel, pos_x]).astype(jnp.float32)[None, :]

    w_ih0 = lstm[0]["w_ih"]  # (517, 4H)
    wih0a, wih0b = w_ih0[: dec_w.shape[1]], w_ih0[dec_w.shape[1] :]
    b0 = (lstm[0]["b_ih"] + lstm[0]["b_hh"])[None, :]
    b1 = (lstm[1]["b_ih"] + lstm[1]["b_hh"])[None, :]
    b2 = (lstm[2]["b_ih"] + lstm[2]["b_hh"])[None, :]

    h_b = h.transpose(1, 0, 2)  # (B, L, H)
    c_b = c.transpose(1, 0, 2)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    def batched(shape):
        return pl.BlockSpec(
            shape, lambda i: (i,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    cmd, h_new, c_new = pl.pallas_call(
        _tail_kernel,
        grid=(b,),
        in_specs=[
            smem((1, 2)),
            batched((1, dflat)),
            batched((1, 5)),
            const(dec_w.shape), const((1, dec_w.shape[1])),
            const(wih0a.shape), const(wih0b.shape),
            const(lstm[0]["w_hh"].shape), const(b0.shape),
            const(lstm[1]["w_ih"].shape), const(lstm[1]["w_hh"].shape), const(b1.shape),
            const(lstm[2]["w_ih"].shape), const(lstm[2]["w_hh"].shape), const(b2.shape),
            const(head_w.shape), const((1, head_w.shape[1])),
            batched((1, h.shape[0], hid)),
            batched((1, h.shape[0], hid)),
        ],
        out_specs=(
            batched((1, 3)),
            batched((1, h.shape[0], hid)),
            batched((1, h.shape[0], hid)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, h.shape[0], hid), jnp.float32),
            jax.ShapeDtypeStruct((b, h.shape[0], hid), jnp.float32),
        ),
        interpret=interpret,
    )(
        pp, flat, extra,
        dec_w, dec_b[None, :],
        wih0a, wih0b, lstm[0]["w_hh"], b0,
        lstm[1]["w_ih"], lstm[1]["w_hh"], b1,
        lstm[2]["w_ih"], lstm[2]["w_hh"], b2,
        head_w, head_b[None, :],
        h_b, c_b,
    )
    return cmd, h_new.transpose(1, 0, 2), c_new.transpose(1, 0, 2)


def _tail_kernel_rows(
    flat_ref,    # VMEM (K, Dflat) f32/bf16 — flattened encoder tokens
    extra_ref,   # VMEM (K, 5) f32: [vel/10, quat] per row
    vel_ref,     # VMEM (K, 1) f32 — per-row desired velocity
    posx_ref,    # VMEM (K, 1) f32
    wdec_ref, bdec_ref,          # (Dflat, 512) bf16, (1, 512) f32
    wih0a_ref, wih0b_ref,        # (512, 4H), (5, 4H)
    whh0_ref, b0_ref,
    wih1_ref, whh1_ref, b1_ref,
    wih2_ref, whh2_ref, b2_ref,
    whead_ref, bhead_ref,
    h_ref, c_ref,                # VMEM (3, K, H) f32 — serve layout
    cmd_ref,                     # out VMEM (K, 3)
    h_out_ref, c_out_ref,        # out VMEM (3, K, H)
):
    """Batched-rows tail: ALL K fleet slots in one grid step — every
    GEMM gains K MXU rows and the whole decoder+LSTM+head+postprocess
    chain costs one launch for the fleet (vs ~15 XLA op launches on the
    turbo path, each with per-op overhead that dominates at K <= 32).
    Per-row desired_vel/pos_x (the fleet serves heterogeneous clients);
    velocity postprocess = serve.postprocess_velocity on (K, 1)
    columns."""
    f32, bf = jnp.float32, jnp.bfloat16

    dec = (
        jnp.dot(
            flat_ref[...].astype(bf), wdec_ref[:],
            preferred_element_type=f32,
        )
        + bdec_ref[0]
    )  # (K, 512)

    def cell(gates, h, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new

    def bdot(x, w_ref):
        return jnp.dot(
            x.astype(bf), w_ref[:].astype(bf), preferred_element_type=f32
        )

    g0 = (
        bdot(dec, wih0a_ref)
        + bdot(extra_ref[...], wih0b_ref)
        + bdot(h_ref[0], whh0_ref)
        + b0_ref[0]
    )
    h0, c0 = cell(g0, h_ref[0], c_ref[0])
    g1 = bdot(h0, wih1_ref) + bdot(h_ref[1], whh1_ref) + b1_ref[0]
    h1, c1 = cell(g1, h_ref[1], c_ref[1])
    g2 = bdot(h1, wih2_ref) + bdot(h_ref[2], whh2_ref) + b2_ref[0]
    h2, c2 = cell(g2, h_ref[2], c_ref[2])
    cmd = bdot(h2, whead_ref) + bhead_ref[0]  # (K, 3)

    vel = vel_ref[...]
    posx = posx_ref[...]
    vx = jnp.clip(cmd[:, 0:1], -1.0, 1.0)
    vy, vz = cmd[:, 1:2], cmd[:, 2:3]
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    scale = jnp.where(norm > 0, vel / norm, vel)
    vx_n, vy_n, vz_n = vx * scale, vy * scale, vz * scale
    vx_floor = jnp.maximum(1.0, posx / 2.0 * vel)
    vx_out = jnp.where(posx < 2.0, vx_floor, vx_n)
    cmd_ref[...] = jnp.concatenate([vx_out, vy_n, vz_n], axis=1)
    h_out_ref[0], h_out_ref[1], h_out_ref[2] = h0, h1, h2
    c_out_ref[0], c_out_ref[1], c_out_ref[2] = c0, c1, c2


@functools.partial(jax.jit, static_argnames=("interpret",))
def tail_fused_rows(
    flat: jax.Array,         # (K, Dflat) f32/bf16
    extra: jax.Array,        # (K, 5) f32 = [vel/10, quat]
    desired_vel: jax.Array,  # (K,) f32 — per-row
    pos_x: jax.Array,        # (K,) f32
    dec_w: jax.Array,        # (Dflat, 512) — row order must match flat's
    dec_b: jax.Array,
    lstm: tuple,
    head_w: jax.Array,
    head_b: jax.Array,
    h: jax.Array,            # (L, K, H) f32 — serve-state layout, as-is
    c: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched tail kernel: (cmd (K, 3) post-processed, h', c'), one
    launch, no grid, no state-layout transposes (takes (L, K, H)
    directly). The decoder weight is stored bf16 in VMEM (half the
    resident bytes of the b1 tail_fused; ~4.7 MB for the flagship)."""
    k, dflat = flat.shape
    hid = h.shape[-1]

    w_ih0 = lstm[0]["w_ih"]
    wih0a, wih0b = w_ih0[: dec_w.shape[1]], w_ih0[dec_w.shape[1] :]
    b0 = (lstm[0]["b_ih"] + lstm[0]["b_hh"])[None, :].astype(jnp.float32)
    b1 = (lstm[1]["b_ih"] + lstm[1]["b_hh"])[None, :].astype(jnp.float32)
    b2 = (lstm[2]["b_ih"] + lstm[2]["b_hh"])[None, :].astype(jnp.float32)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    cmd, h_new, c_new = pl.pallas_call(
        _tail_kernel_rows,
        in_specs=[
            const(flat.shape),
            const((k, 5)), const((k, 1)), const((k, 1)),
            const(dec_w.shape), const((1, dec_w.shape[1])),
            const(wih0a.shape), const(wih0b.shape),
            const(lstm[0]["w_hh"].shape), const(b0.shape),
            const(lstm[1]["w_ih"].shape), const(lstm[1]["w_hh"].shape),
            const(b1.shape),
            const(lstm[2]["w_ih"].shape), const(lstm[2]["w_hh"].shape),
            const(b2.shape),
            const(head_w.shape), const((1, head_w.shape[1])),
            const(h.shape), const(c.shape),
        ],
        out_specs=(
            const((k, 3)), const(h.shape), const(c.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, 3), jnp.float32),
            jax.ShapeDtypeStruct(h.shape, jnp.float32),
            jax.ShapeDtypeStruct(c.shape, jnp.float32),
        ),
        # In-place LSTM state update (same as the megakernel).
        input_output_aliases={18: 1, 19: 2},
        interpret=interpret,
    )(
        flat, extra,
        desired_vel.astype(jnp.float32)[:, None],
        pos_x.astype(jnp.float32)[:, None],
        dec_w.astype(jnp.bfloat16), dec_b[None, :].astype(jnp.float32),
        wih0a, wih0b, lstm[0]["w_hh"], b0,
        lstm[1]["w_ih"], lstm[1]["w_hh"], b1,
        lstm[2]["w_ih"], lstm[2]["w_hh"], b2,
        head_w, head_b[None, :].astype(jnp.float32),
        h, c,
    )
    return cmd, h_new, c_new
