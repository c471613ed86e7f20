"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/shard_map over a Mesh) are exercised without TPU
hardware via XLA's host-platform device partitioning. Env vars must be set
before jax initializes, hence this conftest."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
