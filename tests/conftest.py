"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
XLA's host-platform device virtualization (the same mechanism the driver's
``dryrun_multichip`` uses).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported by a sitecustomize hook with JAX_PLATFORMS
# pointing at real hardware; jax.config.update still wins as long as no
# backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
