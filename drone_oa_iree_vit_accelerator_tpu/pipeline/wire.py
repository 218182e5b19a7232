"""Pure-Python wire codec for the drone UDP protocol.

Same format as native/codec.cpp (and reference
samples/inference_udp_FPGA_custom_dispatch/main.cpp:33-48,320-370):
5424-byte request {u8 image[5400], f32be vel, f32be pos_x, f32be quat[4]},
12-byte reply {3 x f32 host-order}. The native codec is authoritative for
serving; this module is the reference implementation + fallback and is
cross-checked against it in tests.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

REQUEST_SIZE = 5424
IMAGE_SIZE = 5400
IMAGE_SHAPE = (60, 90)
REPLY_SIZE = 12


class Frame(NamedTuple):
    image: np.ndarray  # (60, 90) u8
    desired_velocity: float
    position_x: float
    quaternion: np.ndarray  # (4,) f32 (w, x, y, z)


def unpack_frame(packet: bytes) -> Frame:
    if len(packet) < REQUEST_SIZE:
        raise ValueError(f"short packet: {len(packet)} < {REQUEST_SIZE}")
    image = np.frombuffer(packet, np.uint8, IMAGE_SIZE).reshape(IMAGE_SHAPE)
    scalars = np.frombuffer(packet, ">f4", 6, offset=IMAGE_SIZE)
    return Frame(
        image=image,
        desired_velocity=float(scalars[0]),
        position_x=float(scalars[1]),
        quaternion=scalars[2:6].astype(np.float32),
    )


def pack_frame(
    image: np.ndarray, vel: float, pos_x: float, quat: np.ndarray
) -> bytes:
    scalars = np.asarray([vel, pos_x, *np.asarray(quat, np.float32)], ">f4")
    return np.asarray(image, np.uint8).tobytes() + scalars.tobytes()


def pack_reply(cmd: np.ndarray) -> bytes:
    # Host byte order, matching the reference's htonf_noswap.
    return np.asarray(cmd, np.float32)[:3].tobytes()


def unpack_reply(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, np.float32, 3)
