"""Image ops: bilinear resize with torch-compatible semantics.

The reference resizes in three places, all inside the model graph:

- input refinement to 60x90, ``align_corners=False``
  (models/ITA_single_layer_upsample_shuffle/model.py:32);
- tokenizer feature resize to 8x16, ``align_corners=False``
  (models/ITA/layers.py:23);
- fusion upsample to 16x32, ``align_corners=True`` (model.py:75).

On TPU the efficient formulation is a pair of small dense interpolation
matrices applied as matmuls (rides the MXU and fuses with neighbors),
rather than gathers. Weights are computed at trace time with numpy, so
they are compile-time constants baked into the XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(
    in_size: int, out_size: int, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear interpolation matrix."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1:
        # Degenerate single-sample row: torch samples the origin when
        # align_corners else the image center.
        src = np.array([0.0 if align_corners else in_size / 2.0 - 0.5])
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def bilinear_resize(
    x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of the trailing two axes of an (..., H, W) array.

    Bit-matches torch F.interpolate(mode='bilinear') for both
    align_corners settings (up to f32 accumulation order).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    # Match the input dtype so half-precision paths stay half precision.
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), x.dtype)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), x.dtype)
    # (..., H_in, W_in) @ (W_in, W_out) then contract H.
    y = jnp.einsum("...hw,wW->...hW", x, mw.T)
    return jnp.einsum("...hW,hH->...HW", y, mh.T)


def pixel_shuffle(x: jax.Array, upscale: int) -> jax.Array:
    """torch nn.PixelShuffle on an (..., C*r^2, H, W) array -> (..., C, H*r, W*r)."""
    *lead, c, h, w = x.shape
    r = upscale
    oc = c // (r * r)
    x = x.reshape(*lead, oc, r, r, h, w)
    # (..., oc, r1, r2, h, w) -> (..., oc, h, r1, w, r2)
    x = jnp.moveaxis(x, (-4, -3), (-3, -1))
    return x.reshape(*lead, oc, h * r, w * r)
