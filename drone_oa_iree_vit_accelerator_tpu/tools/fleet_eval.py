"""Closed-loop evaluation over the UDP fleet server.

This reproduces the reference's ACTUAL system topology — the simulator
and the inference server are separate processes joined by the UDP wire
(reference launch_evaluation_FPGA.bash -> run_competition UDP client ->
device serve loop; SURVEY.md sections 3.4/3.6) — at fleet scale: N
drones fly N different worlds simultaneously through ONE fleet server
(pipeline/serve.FleetEngine), each tick one wire round-trip per drone
and one batched device program on the server.

The host side mirrors sim/rollout.rollout_batch's tick semantics
exactly (render -> command -> first-order dynamics -> freeze-finished ->
collision/goal bookkeeping), so the UDP closed loop is directly
comparable to the in-jit evaluation: same worlds, same outcome
definitions — the difference under test is the transport + the fleet
server's slot/batching machinery.
"""

from __future__ import annotations

import ctypes
import socket
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline import wire
from ..pipeline.serve import (
    FleetEngine,
    serve_udp_fleet,
    serve_udp_fleet_native,
)
from ..sim.world import DroneState, World, WorldConfig


def fleet_closed_loop_eval(
    engine: FleetEngine,
    worlds: World,          # stacked (N, ...) — one world per drone
    *,
    wcfg: WorldConfig = WorldConfig(),
    steps: int = 1000,
    desired_vel: float = 5.0,
    native: bool = True,
    reply_timeout_s: float = 300.0,
) -> dict:
    """Fly N drones closed-loop through the fleet UDP server.

    Returns {"success", "collided", "time_to_goal", "final_x"} numpy
    arrays (N,), with the same outcome definitions as
    sim/rollout.rollout_batch. The server thread is started (ephemeral
    port) and stopped inside this call.
    """
    n = int(worlds.radii.shape[0])
    if n > engine.capacity:
        raise ValueError(f"{n} drones > fleet capacity {engine.capacity}")

    # Guard the wall-clock trap: with the FleetEngine default
    # idle_reset_s=2.0, any >2 s gap between a drone's ticks (slow host
    # render, CPU interpret mode, first-compile stall) silently reclaims
    # its slot and zeroes its LSTM state mid-flight. A lockstep eval
    # tolerates arbitrary gaps, so idle reclaim must never fire here:
    # override for the duration and restore on exit.
    saved_idle_reset_s = engine.idle_reset_s
    engine.idle_reset_s = max(saved_idle_reset_s, reply_timeout_s * 2)

    # --- host-side sim step (jitted once; mirrors rollout_batch.tick) ---
    wtup = (
        (worlds.centers, worlds.radii)
        if worlds.kinds is None
        else (worlds.centers, worlds.radii, worlds.kinds)
    )

    @jax.jit
    def render(wt, pos):
        from ..sim.world import render_depth

        return jax.vmap(lambda w, p: render_depth(World(*w), p, wcfg))(
            wt, pos
        )

    @jax.jit
    def advance(pos, vel, cmd, active):
        from ..sim.world import check_collision, step_dynamics

        cmd = jnp.where(active[:, None], cmd, 0.0)
        new = jax.vmap(lambda s, c: step_dynamics(s, c, wcfg))(
            DroneState(pos, vel), cmd
        )
        pos2 = jnp.where(active[:, None], new.pos, pos)
        vel2 = jnp.where(active[:, None], new.vel, vel)
        hit = jax.vmap(lambda w, p: check_collision(World(*w), p, wcfg))(
            wtup, pos2
        )
        return pos2, vel2, hit

    # --- fleet server thread (ephemeral port) ---
    serve = serve_udp_fleet_native if native else serve_udp_fleet
    stop = ctypes.c_int(0) if native else [0]
    port_out: list = []
    serve_rc: list = []  # the server's return value (native: -errno on a
    # hard socket error) — captured so a dead server is diagnosable
    # instead of surfacing only as per-drone TimeoutErrors (ADVICE r3).

    def _serve_capture():
        serve_rc.append(serve(engine, 0, stop, port_out=port_out))

    th = threading.Thread(target=_serve_capture, daemon=True)
    th.start()
    deadline = time.monotonic() + reply_timeout_s
    while not port_out and time.monotonic() < deadline:
        if not th.is_alive():
            # Fail fast: the native loop returns -errno immediately on a
            # bind failure; don't poll out the whole timeout.
            raise RuntimeError("fleet server exited before binding "
                               "(bind error?)")
        time.sleep(0.02)
    if not port_out:
        raise RuntimeError("fleet server failed to bind")
    port = port_out[0]

    socks = []
    for _ in range(n):
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        socks.append(s)

    def recv_with_retry(i, payload, timeout_s):
        """Receive drone i's reply; on timeout, RESEND its request
        (bounded). The server drops a whole tick on any serving error
        (packets consumed, no replies), which would deadlock a
        no-retransmission lockstep loop. A resend can at worst
        double-step that drone's server-side LSTM slot in the rare case
        the REPLY (not the request) was lost — acceptable for an eval,
        fatal to hang without."""
        attempts = 4
        per_try = max(timeout_s / attempts, 1.0)
        for k in range(attempts):
            socks[i].settimeout(per_try)
            try:
                data, _ = socks[i].recvfrom(64)
                return data
            except socket.timeout:
                if k + 1 < attempts:
                    socks[i].sendto(payload, ("127.0.0.1", port))
        server_state = (
            f"server exited rc={serve_rc[0]}" if serve_rc
            else "server thread still running"
        )
        raise TimeoutError(
            f"drone {i}: no reply after {attempts} attempts x "
            f"{per_try:.0f}s ({server_state})"
        )

    def drain(i):
        """Discard stale queued datagrams on drone i's socket. A resend
        that crossed a merely-delayed (not lost) reply leaves a duplicate
        queued; consuming it as the NEXT tick's reply would desynchronize
        that drone's command stream by one tick for the rest of the
        flight (ADVICE r3). The wire reply carries no sequence tag, so
        correctness comes from draining before each new request."""
        socks[i].setblocking(False)
        try:
            while True:
                socks[i].recvfrom(64)
        except (BlockingIOError, OSError):
            pass
        finally:
            socks[i].setblocking(True)

    pos = np.tile(np.asarray([0.0, 0.0, wcfg.spawn_z], np.float32), (n, 1))
    vel = np.zeros((n, 3), np.float32)
    collided = np.zeros((n,), bool)
    done = np.zeros((n,), bool)
    t_goal = np.full((n,), np.inf, np.float32)
    quat = np.asarray([1.0, 0, 0, 0], np.float32)

    try:
        for t in range(steps):
            if done.all():
                break
            # Render the full (static-shape) batch every tick: slicing to
            # active rows would re-specialize the jit per active count,
            # which costs far more than the wasted rays on this platform.
            imgs = np.asarray(render(wtup, jnp.asarray(pos)))
            cmds = np.zeros((n, 3), np.float32)
            active_idx = [i for i in range(n) if not done[i]]
            payloads = {
                i: wire.pack_frame(
                    imgs[i], desired_vel, float(pos[i, 0]), quat
                )
                for i in active_idx
            }
            for i in active_idx:
                drain(i)
                socks[i].sendto(payloads[i], ("127.0.0.1", port))
            # First tick absorbs the server's compile; keep it generous.
            tick_timeout = reply_timeout_s if t == 0 else min(
                reply_timeout_s, 20.0
            )
            for i in active_idx:
                data = recv_with_retry(i, payloads[i], tick_timeout)
                cmds[i] = wire.unpack_reply(data)
            active = ~done
            pos_j, vel_j, hit_j = advance(
                jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(cmds),
                jnp.asarray(active),
            )
            pos = np.asarray(pos_j)
            vel = np.asarray(vel_j)
            hit = np.asarray(hit_j)
            collided |= hit & active
            reached = pos[:, 0] >= wcfg.goal_x
            newly = active & reached & ~collided & np.isinf(t_goal)
            t_goal[newly] = (t + 1) * wcfg.dt
            done |= collided | reached
    finally:
        if native:
            stop.value = 1
        else:
            stop[0] = 1
        for s in socks:
            s.close()
        th.join(timeout=10.0)
        engine.idle_reset_s = saved_idle_reset_s
        if serve_rc and isinstance(serve_rc[0], int) and serve_rc[0] < 0:
            print(f"[fleet_eval] WARNING: native serve loop exited with "
                  f"rc={serve_rc[0]} (-errno)")

    return {
        "success": np.isfinite(t_goal) & ~collided,
        "collided": collided,
        "time_to_goal": t_goal,
        "final_x": pos[:, 0].copy(),
    }
