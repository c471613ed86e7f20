"""Batched SLIC superpixels in pure JAX.

TPU re-design of the reference extractor (slic_edge.cpp:39-86), which runs
cv::ximgproc::SuperpixelSLIC(region_size=20, ruler=0) for 10 iterations and
enforces label connectivity. Here the superpixel assignment is the classic
SLIC local k-means, vectorized: each pixel considers the 3x3 neighborhood of
grid cells around it (covering the 2S x 2S SLIC search window), centers are
updated with segmented means, and connectivity is enforced by
connected-component relabeling plus whole-component absorption of fragments
below 25% of the nominal superpixel area (cv defaults).

Distances are computed in the input color space (the reference feeds BGR
float [0,1] directly, slic_edge.cpp:20-35); ruler weights the spatial term by
(ruler/region_size)^2, so the reference's ruler=0 is pure color clustering
within the local window.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.edges import edges_from_labels
from image_compression_tpu.ops.multicut import relabel_connected


@functools.partial(jax.jit, static_argnames=("region_size", "ruler", "iters"))
def slic_labels(image_f01: jnp.ndarray, region_size: int = 20,
                ruler: float = 0.0, iters: int = 10) -> jnp.ndarray:
    """One image [H, W, C] float [0,1] -> superpixel labels [H, W] int32.

    Defaults mirror slic_edge.h:10-16.
    """
    height, width, _c = image_f01.shape
    s = region_size
    gh = -(-height // s)
    gw = -(-width // s)
    k = gh * gw

    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    cell_y = jnp.minimum(ys // s, gh - 1)
    cell_x = jnp.minimum(xs // s, gw - 1)

    # candidate cells: 3x3 neighborhood (covers the 2S x 2S search window)
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    cand_cells = jnp.stack([
        jnp.clip(cell_y + dy, 0, gh - 1) * gw + jnp.clip(cell_x + dx, 0, gw - 1)
        for dy, dx in offsets], axis=-1)  # [H, W, 9]

    # initial centers at grid-cell centroids
    cy0 = (jnp.arange(gh, dtype=jnp.float32) * s + (s - 1) / 2).clip(max=height - 1)
    cx0 = (jnp.arange(gw, dtype=jnp.float32) * s + (s - 1) / 2).clip(max=width - 1)
    center_y = jnp.repeat(cy0, gw)
    center_x = jnp.tile(cx0, gh)

    img = image_f01.astype(jnp.float32)
    spatial_w = (ruler / s) ** 2

    def mean_by_label(values, labels):
        total = jax.ops.segment_sum(values.reshape(height * width, -1),
                                    labels.reshape(-1), num_segments=k)
        count = jax.ops.segment_sum(
            jnp.ones((height * width,), jnp.float32),
            labels.reshape(-1), num_segments=k)
        return total, count

    def assign(center_color, center_yx):
        cc = center_color[cand_cells]          # [H, W, 9, C]
        cyx = center_yx[cand_cells]            # [H, W, 9, 2]
        d_color = jnp.sum((img[:, :, None, :] - cc) ** 2, axis=-1)
        d_space = ((ys[..., None] - cyx[..., 0]) ** 2
                   + (xs[..., None] - cyx[..., 1]) ** 2)
        dist = d_color + spatial_w * d_space
        pick = jnp.argmin(dist, axis=-1)
        return jnp.take_along_axis(cand_cells, pick[..., None], axis=-1)[..., 0]

    def step(_, state):
        center_color, center_yx = state
        labels = assign(center_color, center_yx)
        color_sum, count = mean_by_label(img, labels)
        yx = jnp.stack([ys, xs], axis=-1).astype(jnp.float32)
        yx_sum, _ = mean_by_label(yx, labels)
        denom = jnp.maximum(count, 1.0)[:, None]
        new_color = jnp.where(count[:, None] > 0, color_sum / denom,
                              center_color)
        new_yx = jnp.where(count[:, None] > 0, yx_sum / denom, center_yx)
        return new_color, new_yx

    color0, cnt0 = mean_by_label(img, cell_y * gw + cell_x)
    center_color = color0 / jnp.maximum(cnt0, 1.0)[:, None]
    center_yx = jnp.stack([center_y, center_x], axis=-1)
    center_color, center_yx = jax.lax.fori_loop(
        0, iters, step, (center_color, center_yx))
    labels = assign(center_color, center_yx)

    # connectivity: split stray fragments, absorb small ones
    min_size = max(1, (s * s) * 25 // 100)  # cv enforceLabelConnectivity default
    return _absorb_small_components(labels, min_size)


@functools.partial(jax.jit, static_argnames=("min_size", "max_rounds"))
def _absorb_small_components(labels: jnp.ndarray, min_size: int,
                             max_rounds: int = 64) -> jnp.ndarray:
    """Relabel to connected components, then merge every component smaller
    than min_size into an adjacent larger one (whole-component absorption,
    like cv enforceLabelConnectivity)."""
    height, width = labels.shape
    n = height * width
    root = relabel_connected(labels).reshape(-1)

    flat_ids = jnp.arange(n, dtype=jnp.int32)
    right = jnp.where((flat_ids % width) + 1 < width, flat_ids + 1, flat_ids)
    down = jnp.where(flat_ids // width + 1 < height, flat_ids + width, flat_ids)

    def body(state):
        root, _changed, it = state
        size = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), root,
                                   num_segments=n)

        def boundary_entries(a, b):
            ra, rb = root[a], root[b]
            diff = ra != rb
            small_a = diff & (size[ra] < min_size)
            small_b = diff & (size[rb] < min_size)
            keys = jnp.concatenate([jnp.where(small_a, ra, n - 1),
                                    jnp.where(small_b, rb, n - 1)])
            vals = jnp.concatenate([jnp.where(small_a, rb, n),
                                    jnp.where(small_b, ra, n)])
            return keys, vals

        k1, v1 = boundary_entries(flat_ids, right)
        k2, v2 = boundary_entries(flat_ids, down)
        keys = jnp.concatenate([k1, k2])
        vals = jnp.concatenate([v1, v2])
        # adopt the LARGEST adjacent component (min id among ties); a min-id
        # pick could deadlock on a tiny neighbor while a big one exists
        entry_ok = vals < n
        vals_safe = jnp.where(entry_ok, vals, 0)
        nb_size = jnp.where(entry_ok, size[vals_safe], -1)
        best_size = jax.ops.segment_max(nb_size, keys, num_segments=n)
        is_best = entry_ok & (nb_size == best_size[keys])
        target = jax.ops.segment_min(jnp.where(is_best, vals, n), keys,
                                     num_segments=n)
        has_target = target < n
        target_safe = jnp.where(has_target, target, 0)
        # absorb only into larger (or equal-size, smaller-id) components:
        # guarantees termination
        ok = has_target & ((size[target_safe] > size) |
                           ((size[target_safe] == size) &
                            (target_safe < flat_ids)))
        mapped = jnp.where(ok, target_safe, flat_ids)
        # compose absorption chains transitively (X->T, T->U => X->U); the
        # size ordering above makes the mapping acyclic, and chains follow
        # adjacency so merged label classes stay connected. Without this,
        # X's pixels would carry a label whose home component moved away.
        for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
            mapped = mapped[mapped]
        new_root = mapped[root]
        return new_root, jnp.any(new_root != root), it + 1

    root, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < max_rounds), body,
        (root, jnp.asarray(True), jnp.asarray(0)))
    return relabel_connected(root.reshape(height, width))


def slic_edge_costs(images: jnp.ndarray, region_size: int = 20,
                    ruler: float = 0.0, iters: int = 10) -> jnp.ndarray:
    """Edge-cost planes [..., H, W, 2]: connect (1) iff same superpixel
    (slic_edge.cpp:62-83). Batched over leading dims."""
    fn = functools.partial(slic_labels, region_size=region_size, ruler=ruler,
                           iters=iters)
    if images.ndim == 4:
        labels = jax.vmap(fn)(images)
    else:
        labels = fn(images)
    return edges_from_labels(labels)
