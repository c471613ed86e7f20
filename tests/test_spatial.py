"""Spatial sharding: halo exchange exactness on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from image_compression_tpu.parallel.mesh import make_mesh
from image_compression_tpu.parallel.spatial import halo_map


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return make_mesh()


def test_halo_map_matches_unsharded_blur(mesh, rng):
    """A radius-2 vertical box blur through halo_map equals the global op."""
    x = jnp.asarray(rng.random((64, 16), np.float32))

    def blur_padded(t):
        # t has 2 halo rows each side; valid output for all padded rows that
        # have both neighbors; edges use replicate padding
        p = jnp.pad(t, ((2, 2), (0, 0)), mode="edge")
        return (p[:-4] + p[1:-3] + p[2:-2] + p[3:-1] + p[4:]) / 5.0

    sharded = halo_map(blur_padded, mesh, halo=2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = np.asarray(sharded(xs))

    p = jnp.pad(x, ((2, 2), (0, 0)), mode="edge")
    expected = np.asarray((p[:-4] + p[1:-3] + p[2:-2] + p[3:-1] + p[4:]) / 5.0)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_halo_map_identity(mesh, rng):
    x = jnp.asarray(rng.random((32, 8), np.float32))
    ident = halo_map(lambda t: t, mesh, halo=1)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    np.testing.assert_array_equal(np.asarray(ident(xs)), np.asarray(x))
