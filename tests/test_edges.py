"""Edge-grid representation contracts (ops/edges.py)."""

import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.edges import (
    edge_validity_masks, edges_from_labels, flatten_edge_planes,
    num_grid_edges, split_model_output, squash_mu, squash_sigma,
    unflatten_edge_planes)


def test_num_grid_edges():
    assert num_grid_edges(256, 256) == 256 * 255 * 2
    assert num_grid_edges(2, 3) == 2 * 2 + 1 * 3


def test_validity_masks():
    m = edge_validity_masks(4, 5)
    assert m.shape == (4, 5, 2)
    assert float(m[..., 0].sum()) == 4 * 4   # last column invalid
    assert float(m[..., 1].sum()) == 3 * 5   # last row invalid


def test_edges_from_labels():
    labels = jnp.array([[0, 0, 1], [0, 1, 1]])
    e = edges_from_labels(labels)
    # horizontal: (0,0)-(0,1) same; (0,1)-(0,2) differ; row1: differ, same
    np.testing.assert_array_equal(np.asarray(e[..., 0]),
                                  [[1, 0, 0], [0, 1, 0]])
    # vertical: col0 same, col1 differ, col2 same
    np.testing.assert_array_equal(np.asarray(e[..., 1]),
                                  [[1, 0, 1], [0, 0, 0]])


def test_flatten_order_matches_reference():
    """Flattened order = horizontal row-major then vertical row-major
    (training.cpp:13-66)."""
    h, w = 3, 4
    planes = jnp.zeros((h, w, 2))
    # tag each valid edge with a unique value encoding (plane, y, x)
    vals_h = jnp.arange(h * (w - 1), dtype=jnp.float32).reshape(h, w - 1)
    vals_v = 100 + jnp.arange((h - 1) * w, dtype=jnp.float32).reshape(h - 1, w)
    planes = planes.at[:, : w - 1, 0].set(vals_h)
    planes = planes.at[: h - 1, :, 1].set(vals_v)
    flat = flatten_edge_planes(planes)
    assert flat.shape == (num_grid_edges(h, w),)
    np.testing.assert_array_equal(np.asarray(flat[: h * (w - 1)]),
                                  np.arange(h * (w - 1), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(flat[h * (w - 1):]),
                                  100 + np.arange((h - 1) * w, dtype=np.float32))


def test_flatten_unflatten_inverse(rng):
    h, w = 5, 7
    planes = jnp.asarray(rng.normal(size=(2, h, w, 2)).astype(np.float32))
    masks = edge_validity_masks(h, w)
    planes = planes * masks  # zero padding positions
    flat = flatten_edge_planes(planes)
    assert flat.shape == (2, num_grid_edges(h, w))
    back = unflatten_edge_planes(flat, h, w)
    np.testing.assert_allclose(np.asarray(back), np.asarray(planes))


def test_split_and_squash(rng):
    out = jnp.asarray(rng.normal(size=(2, 4, 4, 4)).astype(np.float32))
    mu_raw, sigma_raw = split_model_output(out)
    np.testing.assert_array_equal(np.asarray(mu_raw[..., 0]), np.asarray(out[..., 0]))
    np.testing.assert_array_equal(np.asarray(mu_raw[..., 1]), np.asarray(out[..., 2]))
    np.testing.assert_array_equal(np.asarray(sigma_raw[..., 0]), np.asarray(out[..., 1]))
    mu = squash_mu(mu_raw)
    assert float(jnp.abs(mu).max()) < 2.0
    sigma = squash_sigma(sigma_raw)
    assert float(sigma.min()) > 0.1 - 1e-6 and float(sigma.max()) < 0.9 + 1e-6
