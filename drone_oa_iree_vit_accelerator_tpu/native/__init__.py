"""Native (C++) runtime pieces, built on demand with the system toolchain.

``load()`` compiles native/codec.cpp into a cached shared library and
returns a ctypes handle. The reference ships an IREE/CMake cross-compile
stack (SURVEY.md section 2.2); here a single translation unit and one g++
invocation suffice because the heavy lifting (the model) is XLA-compiled.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "codec.cpp"
_BUILD = _DIR / "_build"
_SO = _BUILD / "libdoa_native.so"

REQUEST_SIZE = 5424
IMAGE_SIZE = 5400
REPLY_SIZE = 12

FRAME_CB = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),  # packet
    ctypes.c_size_t,                 # len
    ctypes.POINTER(ctypes.c_uint8),  # reply out (12 bytes)
    ctypes.c_void_p,                 # user
)

BATCH_CB = ctypes.CFUNCTYPE(
    ctypes.c_int,
    ctypes.POINTER(ctypes.c_uint8),   # packets (n * 5424)
    ctypes.POINTER(ctypes.c_uint64),  # peer keys (n)
    ctypes.c_int,                     # n
    ctypes.POINTER(ctypes.c_uint8),   # replies out (n * 12)
    ctypes.POINTER(ctypes.c_uint8),   # send_ok out (n flags)
    ctypes.c_void_p,                  # user
)

_lib = None


def build(force: bool = False) -> pathlib.Path:
    """Compile the native library if missing/outdated; return its path."""
    _BUILD.mkdir(exist_ok=True)
    if force or not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_SO), str(_SRC),
            ],
            check=True,
            capture_output=True,
        )
    return _SO


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native library."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build()))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.doa_unpack_frame.restype = ctypes.c_int
        lib.doa_unpack_frame.argtypes = [u8p, ctypes.c_size_t, u8p, f32p]
        lib.doa_pack_reply.restype = None
        lib.doa_pack_reply.argtypes = [f32p, u8p]
        lib.doa_pack_frame.restype = None
        lib.doa_pack_frame.argtypes = [u8p, ctypes.c_float, ctypes.c_float, f32p, u8p]
        lib.doa_unpack_reply.restype = None
        lib.doa_unpack_reply.argtypes = [u8p, f32p]
        lib.doa_udp_serve.restype = ctypes.c_long
        lib.doa_udp_serve.argtypes = [
            ctypes.c_uint16, FRAME_CB, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.doa_udp_serve_fleet.restype = ctypes.c_long
        lib.doa_udp_serve_fleet.argtypes = [
            ctypes.c_uint16,                 # port (0 = ephemeral)
            ctypes.c_int,                    # capacity
            ctypes.c_int,                    # window_us
            BATCH_CB, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),    # stop flag
            ctypes.POINTER(ctypes.c_int),    # bound port out
        ]
        _lib = lib
    return _lib
