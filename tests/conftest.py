"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip code paths (pjit/shard_map over a Mesh) are exercised without TPU
hardware via XLA's host-platform device partitioning. Env vars must be set
before jax initializes, hence this conftest."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU plugin (sitecustomize) may have already imported jax
# and pinned jax_platforms before this conftest ran; force the CPU backend
# and the 8-device mesh at the config level too.
def _force_cpu_mesh(n: int = 8) -> None:
    from jax.extend.backend import clear_backends
    for attempt in range(2):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n)
        except RuntimeError:
            clear_backends()
            continue
        if len(jax.devices()) == n:
            return
        clear_backends()
    assert len(jax.devices()) == n, jax.devices()


_force_cpu_mesh()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
