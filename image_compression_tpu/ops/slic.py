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
    height, width, chans = image_f01.shape
    s = region_size
    gh = -(-height // s)
    gw = -(-width // s)
    hp, wp = gh * s, gw * s  # padded to whole cells

    img = jnp.pad(image_f01.astype(jnp.float32),
                  ((0, hp - height), (0, wp - width), (0, 0)), mode="edge")
    ys = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    ysf = ys.astype(jnp.float32)
    xsf = xs.astype(jnp.float32)
    spatial_w = (ruler / s) ** 2

    # Everything runs on cell grids and plane shifts: the 3x3 candidate
    # centers of a pixel are constant within its cell, so candidate values
    # come from shifted [gh, gw] center grids upsampled by `s` — no per-pixel
    # gathers; center updates are per-cell reshape-sums shift-added back —
    # no scatters. (TPU serializes 1-element-row gathers/scatters.)
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def up(cell_grid):
        # [gh, gw, ...] -> pixel resolution
        return jnp.repeat(jnp.repeat(cell_grid, s, axis=0), s, axis=1)

    def cell_sum(pixel_vals):
        # [hp, wp, ...] -> per-cell sums [gh, gw, ...]
        shp = pixel_vals.shape[2:]
        return pixel_vals.reshape(gh, s, gw, s, *shp).sum(axis=(1, 3))

    def shift_cells(grid, dy, dx):
        # value of cell (cy+dy, cx+dx), edge-clamped
        pads = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))] + \
            [(0, 0)] * (grid.ndim - 2)
        out = jnp.pad(grid, pads, mode="edge")
        return out[max(0, dy):max(0, dy) + gh, max(0, dx):max(0, dx) + gw]

    def cell_valid(dy, dx):
        """[gh, gw] bool: does cell (cy+dy, cx+dx) exist?"""
        cyg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
        cxg = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
        return ((cyg + dy >= 0) & (cyg + dy < gh)
                & (cxg + dx >= 0) & (cxg + dx < gw))

    def assign(center_color, center_y, center_x):
        # center_*: [gh, gw(, C)]. Out-of-range candidates are invalid (inf)
        # rather than clamped, so the chosen offset maps exactly to one cell
        # and the reverse-shift accumulation below stays consistent.
        best_d = jnp.full((hp, wp), jnp.inf)
        best_o = jnp.zeros((hp, wp), jnp.int32)
        for o, (dy, dx) in enumerate(offsets):
            cc = up(shift_cells(center_color, dy, dx))
            cy = up(shift_cells(center_y, dy, dx))
            cx = up(shift_cells(center_x, dy, dx))
            ok = up(cell_valid(dy, dx))
            d = jnp.sum((img - cc) ** 2, axis=-1) \
                + spatial_w * ((ysf - cy) ** 2 + (xsf - cx) ** 2)
            d = jnp.where(ok, d, jnp.inf)
            take = d < best_d
            best_d = jnp.where(take, d, best_d)
            best_o = jnp.where(take, o, best_o)
        return best_o  # chosen offset index per pixel

    # reverse shift with zero fill (border spill must not double-count)
    def shift_cells_zero(grid, dy, dx):
        pads = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))] + \
            [(0, 0)] * (grid.ndim - 2)
        out = jnp.pad(grid, pads)
        return out[max(0, dy):max(0, dy) + gh, max(0, dx):max(0, dx) + gw]

    def centers_from_exact(best_o, old):
        color_sum = jnp.zeros((gh, gw, chans))
        y_sum = jnp.zeros((gh, gw))
        x_sum = jnp.zeros((gh, gw))
        count = jnp.zeros((gh, gw))
        for o, (dy, dx) in enumerate(offsets):
            m = (best_o == o).astype(jnp.float32)
            color_sum = color_sum + shift_cells_zero(
                cell_sum(img * m[..., None]), -dy, -dx)
            y_sum = y_sum + shift_cells_zero(cell_sum(ysf * m), -dy, -dx)
            x_sum = x_sum + shift_cells_zero(cell_sum(xsf * m), -dy, -dx)
            count = count + shift_cells_zero(cell_sum(m), -dy, -dx)
        denom = jnp.maximum(count, 1.0)
        occ = count > 0
        old_color, old_y, old_x = old
        return (jnp.where(occ[..., None], color_sum / denom[..., None],
                          old_color),
                jnp.where(occ, y_sum / denom, old_y),
                jnp.where(occ, x_sum / denom, old_x))

    # initial centers = cell means
    ones = jnp.ones((hp, wp))
    c0 = cell_sum(img) / cell_sum(ones)[..., None]
    y0 = cell_sum(ysf) / cell_sum(ones)
    x0 = cell_sum(xsf) / cell_sum(ones)

    def step(_, state):
        center_color, center_y, center_x = state
        best_o = assign(center_color, center_y, center_x)
        return centers_from_exact(best_o, state)

    center_color, center_y, center_x = jax.lax.fori_loop(
        0, iters, step, (c0, y0, x0))
    best_o = assign(center_color, center_y, center_x)

    # offset choice -> superpixel label = chosen cell index (offsets are
    # in-range by construction: invalid candidates scored inf in assign)
    cell_y = ys // s
    cell_x = xs // s
    labels = jnp.zeros((hp, wp), jnp.int32)
    for o, (dy, dx) in enumerate(offsets):
        lab_o = (cell_y + dy) * gw + (cell_x + dx)
        labels = jnp.where(best_o == o, lab_o, labels)
    labels = labels[:height, :width]

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
