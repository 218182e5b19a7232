"""Python binding for the C++ ITA attention FFI custom call (CPU).

Builds native/ita_ffi.cpp against jax's bundled XLA FFI headers,
registers the handler with the CPU backend, and exposes
``ita_attention_ffi`` with the same contract as
ops.integer_ita.ita_attention_int8 (H=1). See ita_ffi.cpp for why this
exists (the reference's external-native-object dispatch mechanism).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import jax
import jax.numpy as jnp

from ..ops.integer_ita import IntAttentionParams

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "ita_ffi.cpp"
_BUILD = _DIR / "_build"
_SO = _BUILD / "libita_ffi.so"

_registered = False


def _build() -> pathlib.Path:
    _BUILD.mkdir(exist_ok=True)
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                f"-I{jax.ffi.include_dir()}",
                "-o", str(_SO), str(_SRC),
            ],
            check=True,
            capture_output=True,
        )
    return _SO


def register() -> None:
    """Compile (if needed) and register the FFI target with XLA's CPU
    backend. Idempotent."""
    global _registered
    if _registered:
        return
    lib = ctypes.CDLL(str(_build()))
    jax.ffi.register_ffi_target(
        "ita_attention_int8",
        jax.ffi.pycapsule(lib.ItaAttentionInt8),
        platform="cpu",
    )
    _registered = True


def ita_attention_ffi(x_i8: jax.Array, p: IntAttentionParams) -> jax.Array:
    """int8 (S,E) -> int8 (S,E) through the C++ custom call (CPU only).

    Jit-compatible: the call is a node inside the XLA program, exactly
    like the reference's flow.dispatch into ITA_dispatch.o.
    """
    register()
    s, e = x_i8.shape
    iscal = jnp.stack(
        [
            p.q.mult, p.q.shift, p.k.mult, p.k.shift, p.v.mult, p.v.shift,
            p.qk_mult, p.qk_shift, p.av_mult, p.av_shift, p.o.mult, p.o.shift,
        ]
    ).astype(jnp.int32)
    call = jax.ffi.ffi_call(
        "ita_attention_int8",
        jax.ShapeDtypeStruct((s, e), jnp.int8),
    )
    return call(
        x_i8,
        p.q.w, p.q.b, p.k.w, p.k.b, p.v.w, p.v.b, p.o.w, p.o.b, iscal,
    )
