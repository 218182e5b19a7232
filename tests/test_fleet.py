"""FleetEngine: multi-drone batched serving with per-client state slots.

The reference serves exactly one drone per device (batch-1 .vmfb loop
with a single global LSTM state, main.cpp:143-148); the fleet engine
serves up to `capacity` clients through ONE batched device program.
These tests pin the two properties that make that correct:

- state isolation: a client's command stream is unaffected by other
  clients sharing the batch (row-independent math + masked state);
- slot lifecycle: idle slots are reclaimed and handed to new clients
  with freshly zeroed recurrent state (per-trajectory reset analog).
"""

import socket
import threading
import time

import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.pipeline import wire
from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
    FleetEngine,
    serve_udp_fleet,
)


def _frame(seed: int, vel: float = 5.0, pos_x: float = 3.0) -> wire.Frame:
    rng = np.random.RandomState(seed)
    return wire.Frame(
        image=rng.randint(0, 256, wire.IMAGE_SHAPE).astype(np.uint8),
        desired_velocity=vel,
        position_x=pos_x,
        quaternion=np.asarray([1.0, 0, 0, 0], np.float32),
    )


def test_fleet_state_isolation():
    """Client A's commands are identical whether it flies alone or
    shares the batch with client B (and match frame-order invariance)."""
    eng_ab = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    eng_a = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)

    # idle_reset_s is huge: interpret-mode ticks take seconds of wall
    # time, and the default 2 s reclaim would reset the client's state
    # slot mid-test (the exact behavior test_fleet_slot_reclaim checks).
    cmds_ab, cmds_a = [], []
    for t in range(3):
        fa, fb = _frame(100 + t), _frame(200 + t)
        out = eng_ab.process_batch([("A", fa), ("B", fb)])
        cmds_ab.append(out["A"])
        cmds_a.append(eng_a.process_batch([("A", fa)])["A"])
    for got, want in zip(cmds_ab, cmds_a):
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fleet_slot_reclaim_resets_state():
    """After A goes idle its slot is reclaimed; the next client starts
    from zeroed LSTM state (first command equals a fresh client's)."""
    eng = FleetEngine(CFG, capacity=1, idle_reset_s=0.05)
    f0 = _frame(7)
    first_a = eng.process_batch([("A", f0)])["A"]
    eng.process_batch([("A", _frame(8))])  # advance A's state
    time.sleep(0.1)  # A idles past the reclaim threshold
    first_c = eng.process_batch([("C", f0)])["C"]
    np.testing.assert_allclose(first_c, first_a, rtol=1e-5, atol=1e-6)


def test_fleet_capacity_guard_is_atomic():
    """A capacity overflow raises BEFORE any mutation: no slot leaks to
    the rejected client, no existing client's state or slot is touched,
    and the engine keeps serving normally afterwards."""
    eng = FleetEngine(CFG, capacity=2, idle_reset_s=3600.0)
    twin = FleetEngine(CFG, capacity=2, idle_reset_s=3600.0)
    eng.process_batch([("A", _frame(1)), ("B", _frame(2))])
    twin.process_batch([("A", _frame(1)), ("B", _frame(2))])
    slots_before = dict(eng.slots)
    with pytest.raises(RuntimeError, match="at capacity"):
        # Mixed batch: existing A + overflowing C — must serve NEITHER
        # and mutate NOTHING (all-or-nothing).
        eng.process_batch([("A", _frame(9)), ("C", _frame(3))])
    assert eng.slots == slots_before and "C" not in eng.slots
    # The engine still serves A/B with uncorrupted recurrent state: its
    # next tick equals the twin's (which never saw the failed batch).
    got = eng.process_batch([("A", _frame(4)), ("B", _frame(5))])
    want = twin.process_batch([("A", _frame(4)), ("B", _frame(5))])
    for k in ("A", "B"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_fleet_udp_loopback():
    """Three UDP clients share the fleet server; each reply matches a
    twin engine's direct process_batch output (wire format per client is
    byte-identical to the single-drone server)."""
    server = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    twin = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    stop = [0]
    port_out: list = []
    th = threading.Thread(
        target=serve_udp_fleet,
        args=(server, 0, stop),  # port 0: ephemeral, no collisions
        kwargs={"port_out": port_out},
        daemon=True,
    )
    th.start()
    deadline = time.monotonic() + 60.0
    while not port_out and time.monotonic() < deadline:
        time.sleep(0.02)
    assert port_out, "fleet server failed to bind"
    port = port_out[0]

    frames = {name: _frame(i) for i, name in enumerate(("A", "B", "C"))}
    socks = {}
    try:
        for name, fr in frames.items():
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.settimeout(120.0)
            s.sendto(
                wire.pack_frame(
                    fr.image, fr.desired_velocity, fr.position_x,
                    fr.quaternion,
                ),
                ("127.0.0.1", port),
            )
            socks[name] = s
        replies = {}
        for name, s in socks.items():
            data, _ = s.recvfrom(64)
            assert len(data) == wire.REPLY_SIZE
            replies[name] = wire.unpack_reply(data)
    finally:
        stop[0] = 1
        for s in socks.values():
            s.close()
        th.join(timeout=5.0)

    # The server may have batched the three clients into 1-3 ticks; in
    # every grouping each client's first command equals the twin's
    # single-tick result (state isolation + fresh slots).
    want = twin.process_batch(list(frames.items()))
    for name in frames:
        np.testing.assert_allclose(
            replies[name], want[name], rtol=1e-4, atol=1e-5
        )


def test_fleet_sharded_over_mesh_matches_single_device():
    """FleetEngine over an 8-device mesh (capacity sharded, params
    replicated, zero cross-chip traffic per tick) serves every client
    identically to the single-device fleet engine."""
    import jax

    from drone_oa_iree_vit_accelerator_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(8)
    eng_mesh = FleetEngine(CFG, capacity=16, idle_reset_s=3600.0, mesh=mesh)
    eng_one = FleetEngine(CFG, capacity=16, idle_reset_s=3600.0)

    for t in range(2):
        items = [(f"drone{i}", _frame(1000 + 10 * i + t)) for i in range(5)]
        got = eng_mesh.process_batch(items)
        want = eng_one.process_batch(items)
        for cid in got:
            # Shard-local batch (16/8=2 rows) changes the f32/bf16 glue
            # summation shapes vs one batch-16 program; the integer
            # encoder region is bit-identical, so agreement is at float-
            # glue tolerance, not exact.
            np.testing.assert_allclose(
                got[cid], want[cid], rtol=5e-4, atol=5e-5
            )

    with pytest.raises(ValueError, match="divide evenly"):
        FleetEngine(CFG, capacity=12, mesh=mesh)


def test_fleet_udp_loopback_native():
    """Same three-client loopback through the NATIVE C++ fleet loop
    (native/codec.cpp doa_udp_serve_fleet): per-tick batching, peer
    keying and reply fan-out in native code, Python entered once per
    tick."""
    import ctypes

    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        serve_udp_fleet_native,
    )

    server = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    twin = FleetEngine(CFG, capacity=4, idle_reset_s=3600.0)
    stop = ctypes.c_int(0)
    port_out: list = []
    th = threading.Thread(
        target=serve_udp_fleet_native,
        args=(server, 0, stop),
        kwargs={"port_out": port_out},
        daemon=True,
    )
    th.start()
    deadline = time.monotonic() + 120.0
    while not port_out and time.monotonic() < deadline:
        time.sleep(0.02)
    assert port_out, "native fleet server failed to bind"
    port = port_out[0]

    frames = {name: _frame(40 + i) for i, name in enumerate(("A", "B", "C"))}
    socks, replies = {}, {}
    try:
        for name, fr in frames.items():
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.settimeout(120.0)
            s.sendto(
                wire.pack_frame(
                    fr.image, fr.desired_velocity, fr.position_x,
                    fr.quaternion,
                ),
                ("127.0.0.1", port),
            )
            socks[name] = s
        for name, s in socks.items():
            data, _ = s.recvfrom(64)
            assert len(data) == wire.REPLY_SIZE
            replies[name] = wire.unpack_reply(data)
    finally:
        stop.value = 1
        for s in socks.values():
            s.close()
        th.join(timeout=10.0)

    want = twin.process_batch(list(frames.items()))
    for name in frames:
        np.testing.assert_allclose(
            replies[name], want[name], rtol=1e-4, atol=1e-5
        )


def test_fleet_udp_overflow_degrades_to_known_clients():
    """A stranger hitting a full fleet must not break service: known
    clients keep getting replies, the stranger gets none (the serve loop
    retries the tick with the known-client subset)."""
    server = FleetEngine(CFG, capacity=2, idle_reset_s=3600.0)
    stop = [0]
    port_out: list = []
    th = threading.Thread(
        target=serve_udp_fleet,
        args=(server, 0, stop),
        kwargs={"port_out": port_out},
        daemon=True,
    )
    th.start()
    deadline = time.monotonic() + 60.0
    while not port_out and time.monotonic() < deadline:
        time.sleep(0.02)
    assert port_out
    port = port_out[0]

    def send(sock, fr):
        sock.sendto(
            wire.pack_frame(
                fr.image, fr.desired_velocity, fr.position_x, fr.quaternion
            ),
            ("127.0.0.1", port),
        )

    sa = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sb = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sc = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sa.settimeout(120.0)
    sb.settimeout(120.0)
    sc.settimeout(3.0)  # the stranger: expect NO reply
    try:
        # Establish A and B (fills capacity).
        send(sa, _frame(70))
        sa.recvfrom(64)
        send(sb, _frame(71))
        sb.recvfrom(64)
        # Now everyone fires, including the stranger C.
        send(sa, _frame(72))
        send(sb, _frame(73))
        send(sc, _frame(74))
        data_a, _ = sa.recvfrom(64)
        data_b, _ = sb.recvfrom(64)
        assert len(data_a) == wire.REPLY_SIZE
        assert len(data_b) == wire.REPLY_SIZE
        with pytest.raises(socket.timeout):
            sc.recvfrom(64)
    finally:
        stop[0] = 1
        for s in (sa, sb, sc):
            s.close()
        th.join(timeout=5.0)


def test_fleet_mega_matches_turbo_fleet():
    """path='mega' (whole-fleet megakernel, one launch + one weight
    stream per tick) tracks the turbo fleet engine at glue tolerance on
    the same params, and is deterministic across twin engines
    (bit-equal commands)."""
    import jax
    import jax.numpy as jnp
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu import quant as QZ

    key = jax.random.PRNGKey(0)
    params = M.init_params(CFG, key)
    int_params, _ = QZ.calibrate_ptq(
        CFG, params, jax.random.randint(key, (4, 1, 60, 90), 0, 256,
                                        jnp.uint8)
    )
    mk = lambda path: FleetEngine(
        CFG, params=params, int_params=int_params, capacity=8,
        path=path, idle_reset_s=3600.0,
    )
    eng_mega, eng_twin, eng_turbo = mk("mega"), mk("mega"), mk("turbo")
    for t in range(2):
        items = [("A", _frame(300 + t)), ("B", _frame(400 + t, pos_x=0.5))]
        got = eng_mega.process_batch(items)
        twin = eng_twin.process_batch(items)
        ref = eng_turbo.process_batch(items)
        for cid in ("A", "B"):
            np.testing.assert_array_equal(got[cid], twin[cid])
            np.testing.assert_allclose(got[cid], ref[cid],
                                       rtol=0.08, atol=0.05)


def test_fleet_mega_guards():
    """path='mega' rejects unsupported shapes loudly."""
    with pytest.raises(ValueError, match="capacity % 8"):
        FleetEngine(CFG, capacity=4, path="mega")
    from drone_oa_iree_vit_accelerator_tpu.core import ITA_BASE

    with pytest.raises(ValueError, match="flagship"):
        FleetEngine(ITA_BASE, capacity=8, path="mega")


def test_fleet_fused_matches_turbo_fleet():
    """path='fused' (T-encoder kernel + batched-rows tail kernel)
    tracks the turbo fleet engine at glue tolerance and is
    deterministic across twin engines."""
    import jax
    import jax.numpy as jnp
    from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
    from drone_oa_iree_vit_accelerator_tpu import quant as QZ

    key = jax.random.PRNGKey(1)
    params = M.init_params(CFG, key)
    int_params, _ = QZ.calibrate_ptq(
        CFG, params, jax.random.randint(key, (4, 1, 60, 90), 0, 256,
                                        jnp.uint8)
    )
    mk = lambda path: FleetEngine(
        CFG, params=params, int_params=int_params, capacity=8,
        path=path, idle_reset_s=3600.0,
    )
    eng_f, eng_twin, eng_t = mk("fused"), mk("fused"), mk("turbo")
    for t in range(2):
        items = [("A", _frame(500 + t)), ("B", _frame(600 + t, pos_x=0.5))]
        got = eng_f.process_batch(items)
        twin = eng_twin.process_batch(items)
        ref = eng_t.process_batch(items)
        for cid in ("A", "B"):
            np.testing.assert_array_equal(got[cid], twin[cid])
            np.testing.assert_allclose(got[cid], ref[cid],
                                       rtol=0.08, atol=0.05)
