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


def _smooth_costs(size, rng):
    """Piecewise-smooth signed cost field (the bench workload's shape)."""
    base = rng.normal(size=(size // 16 + 1, size // 16 + 1, 3))
    img = np.kron(base, np.ones((16, 16, 1)))[:size, :size]
    img += 0.1 * rng.normal(size=img.shape)
    img = (img - img.min()) / (img.max() - img.min())
    dh = np.abs(np.diff(img, axis=1, append=img[:, -1:])).sum(-1)
    dv = np.abs(np.diff(img, axis=0, append=img[-1:, :])).sum(-1)
    costs = np.stack([1.0 - 8.0 * dh, 1.0 - 8.0 * dv], axis=-1)
    return np.clip(costs, -2, 2).astype(np.float32)


def test_spatial_multicut_matches_single_device(mesh, rng):
    """The strip-sharded hierarchical multicut must produce the unsharded
    partition exactly (chain mode, no freezing on smooth costs): levels with
    supertile side <= strip height are strictly strip-local because the
    hierarchy zeroes supertile-crossing edges (VERDICT round-2 next #6)."""
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.parallel.spatial import multicut_grid_spatial

    costs = jnp.asarray(_smooth_costs(256, rng))
    expected = np.asarray(multicut_grid(costs, icm_sweeps=0))

    cs = jax.device_put(costs, NamedSharding(mesh, P("data")))
    got = np.asarray(multicut_grid_spatial(cs, mesh))
    np.testing.assert_array_equal(got, expected)
    # slot-space continuation (agg="matrix"): same partition, and on this
    # smooth field the same labels as the pixel path
    got_m = np.asarray(multicut_grid_spatial(cs, mesh, agg="matrix"))
    np.testing.assert_array_equal(got_m, expected)


def test_spatial_multicut_trivial_invariants(mesh, rng):
    """All-attractive costs -> one cluster; all-repulsive -> singletons."""
    from image_compression_tpu.parallel.spatial import multicut_grid_spatial

    ones = jnp.ones((64, 64, 2), jnp.float32)
    lab = np.asarray(multicut_grid_spatial(ones, mesh))
    assert len(np.unique(lab)) == 1
    lab = np.asarray(multicut_grid_spatial(-ones, mesh))
    assert len(np.unique(lab)) == 64 * 64
