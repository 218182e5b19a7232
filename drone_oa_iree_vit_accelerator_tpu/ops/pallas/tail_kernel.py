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
