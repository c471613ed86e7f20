"""Grid-edge representation: the framework-wide tensor contract.

A 4-connected pixel grid on an HxW image has E = H*(W-1) + (H-1)*W edges. We
keep edge quantities in image-plane form as NHWC arrays `[..., H, W, 2]`:

  plane 0 ("horizontal", `h`): edge between (y, x) and (y, x+1); the last
      column is padding and must be ignored (mask 0).
  plane 1 ("vertical", `v`):   edge between (y, x) and (y+1, x); the last row
      is padding and must be ignored (mask 0).

Semantics of edge *costs*: positive / 1.0 = attraction ("connect"),
negative / 0.0 = repulsion ("cut"); matches the reference contract
(canny_edge.h:5-17, EdgeDataset.h:15-19).

The flattened edge-list ordering (for policy log-probs and parity with the
reference) is: all horizontal edges row-major over (y, x<W-1), then all
vertical edges row-major over (y<H-1, x) — mirroring
training.cpp:13-34 (flatten_grid_edges) and training.cpp:36-66
(build_rama_indices). On TPU we never materialize the COO index lists; the
grid topology stays implicit in the plane layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def num_grid_edges(height: int, width: int) -> int:
    """Edge count of the 4-connected grid: H*(W-1) + (H-1)*W."""
    return height * (width - 1) + (height - 1) * width


def edge_validity_masks(height: int, width: int, dtype=jnp.float32):
    """Masks [H, W, 2]: 1 where an edge plane entry is a real edge.

    Mirrors the mask channels written by the reference dataset
    (EdgeDataset.h:52-53): horizontal valid iff x+1 < W, vertical iff y+1 < H.
    """
    mask_h = jnp.ones((height, width), dtype).at[:, width - 1].set(0)
    mask_v = jnp.ones((height, width), dtype).at[height - 1, :].set(0)
    return jnp.stack([mask_h, mask_v], axis=-1)


def edges_from_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Connect/cut planes from a label map.

    labels: [..., H, W] integer segmentation. Returns [..., H, W, 2] float32
    with 1.0 where the two endpoints share a label ("connect"), 0.0 otherwise;
    padding positions (last column / last row) are 0. This is the common core
    of all four classical extractors (e.g. slic_edge.cpp:62-83,
    graph_based_edge.cpp:70-91).
    """
    same_h = labels[..., :, :-1] == labels[..., :, 1:]
    same_v = labels[..., :-1, :] == labels[..., 1:, :]
    h = jnp.pad(same_h.astype(jnp.float32), _pad_last_col(labels.ndim))
    v = jnp.pad(same_v.astype(jnp.float32), _pad_last_row(labels.ndim))
    return jnp.stack([h, v], axis=-1)


def _pad_last_col(ndim: int):
    return [(0, 0)] * (ndim - 1) + [(0, 1)]


def _pad_last_row(ndim: int):
    return [(0, 0)] * (ndim - 2) + [(0, 1), (0, 0)]


def flatten_edge_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 2] -> [..., E] in the reference's edge-list order.

    Horizontal edges first (row-major over [H, W-1]), then vertical
    (row-major over [H-1, W]); parity with flatten_grid_edges
    (training.cpp:13-34) and build_rama_indices (training.cpp:36-66).
    """
    h = planes[..., :, : planes.shape[-2] - 1, 0]
    v = planes[..., : planes.shape[-3] - 1, :, 1]
    batch = planes.shape[:-3]
    return jnp.concatenate(
        [h.reshape(*batch, -1), v.reshape(*batch, -1)], axis=-1
    )


def unflatten_edge_planes(flat: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Inverse of flatten_edge_planes; padding entries are zero."""
    n_h = height * (width - 1)
    batch = flat.shape[:-1]
    h = flat[..., :n_h].reshape(*batch, height, width - 1)
    v = flat[..., n_h:].reshape(*batch, height - 1, width)
    h = jnp.pad(h, [(0, 0)] * len(batch) + [(0, 0), (0, 1)])
    v = jnp.pad(v, [(0, 0)] * len(batch) + [(0, 1), (0, 0)])
    return jnp.stack([h, v], axis=-1)


def split_model_output(out_nhwc4: jnp.ndarray):
    """Model output [..., H, W, 4] -> (mu_planes, sigma_planes) each [..., H, W, 2].

    Channel contract matches EdgeUNet (training.cpp:145-152): channels 0/1 are
    (mu_raw, sigma_raw) for horizontal edges, channels 2/3 for vertical.
    """
    mu = jnp.stack([out_nhwc4[..., 0], out_nhwc4[..., 2]], axis=-1)
    sigma = jnp.stack([out_nhwc4[..., 1], out_nhwc4[..., 3]], axis=-1)
    return mu, sigma


def squash_mu(raw_mu: jnp.ndarray, mu_scale: float = 2.0) -> jnp.ndarray:
    """mu = mu_scale * tanh(0.5 * raw)  (training.cpp:154-157)."""
    return mu_scale * jnp.tanh(0.5 * raw_mu)


def squash_sigma(raw_sigma: jnp.ndarray, sigma_min: float = 0.1,
                 sigma_max: float = 0.9) -> jnp.ndarray:
    """sigma = min + (max-min)*sigmoid(raw)  (training.cpp:158)."""
    return sigma_min + (sigma_max - sigma_min) * jax_sigmoid(raw_sigma)


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / (1.0 + jnp.exp(-x))
