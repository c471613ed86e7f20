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
    return _absorb_small_components_dense(labels, min_size)


def _despeckle(labels: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Elementwise speckle absorption: a pixel with at most one same-label
    8-neighbor belongs to a 1-2 px fragment (or a fragment tip) and adopts
    an adjacent label; iterating erodes the thin stray fragments the SLIC
    assignment leaves in noise. This keeps the fragment count the dense
    absorption's slot cap can hold (noisy images produce thousands of
    speckles, far beyond any static slot count)."""
    height, width = labels.shape

    def shifted(arr, dy, dx):
        pad = ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
        out = jnp.pad(arr, pad, constant_values=-1)
        return out[max(0, dy):max(0, dy) + height,
                   max(0, dx):max(0, dx) + width]

    dirs8 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0)]
    adopt_from = [(0, 1), (1, 0), (0, -1), (-1, 0)]

    def sweep(i, lab):
        same = jnp.zeros_like(lab)
        for dy, dx in dirs8:
            same = same + (shifted(lab, dy, dx) == lab).astype(jnp.int32)
        speckle = same <= 1
        out = lab
        for k in range(4):
            nb = shifted(lab, *adopt_from[(k + i) % 4])
            out = jnp.where(speckle & (out == lab) & (nb >= 0), nb, out)
        return out

    lab = labels
    for i in range(sweeps):  # unrolled: direction rotation is static
        lab = sweep(i, lab)
    return lab


@functools.partial(jax.jit, static_argnames=("min_size", "slots", "rounds"))
def _absorb_small_components_dense(labels: jnp.ndarray, min_size: int,
                                   slots: int = 768,
                                   rounds: int = 4) -> jnp.ndarray:
    """Slot-space version of _absorb_small_components: components get dense
    ranks (ops/segment_stats.py::dense_ranks) and every absorption round runs
    as [n, slots] compare-reduces + slot-space one-hot matmuls — no
    per-element scatters, no n-segment reductions, no pointer-jump gathers
    (the while_loop version spent ~45 ms/img in those at 256px; this runs in
    a few ms). Components ranked beyond `slots` (pathological fragment
    counts) keep their labels unabsorbed; the pixel-space version remains
    for correctness comparisons in tests."""
    from image_compression_tpu.ops.segment_stats import dense_ranks

    height, width = labels.shape
    n = height * width
    root = relabel_connected(_despeckle(labels))
    rank = dense_ranks(root, slots)                       # [H, W], -1 frozen
    sid = jnp.arange(slots, dtype=jnp.int32)

    def shifted(arr, dy, dx):
        pad = ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)))
        out = jnp.pad(arr, pad, constant_values=-1)
        return out[max(0, dy):max(0, dy) + height,
                   max(0, dx):max(0, dx) + width]

    def take(vec_s, idx_hw):
        # vec_s [S] f32-exact -> per-pixel values at idx (0 where idx < 0);
        # f32 one-hots: component sizes exceed bf16's exact-integer range
        oh = jax.nn.one_hot(idx_hw, slots, dtype=jnp.float32)
        return jnp.einsum("hws,s->hw", oh, vec_s,
                          preferred_element_type=jnp.float32)

    def body(_, rank):
        oh = jax.nn.one_hot(rank, slots, dtype=jnp.bfloat16)   # [H, W, S]
        size = jnp.sum(oh, axis=(0, 1), dtype=jnp.float32)     # [S]
        small = (size > 0) & (size < float(min_size))

        nb_best = jnp.full((slots,), -1.0)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            p = shifted(rank, dy, dx)
            psize = jnp.where((p >= 0) & (p != rank), take(size, p), -1.0)
            nb_best = jnp.maximum(
                nb_best, jnp.max(jnp.where(oh > 0, psize[..., None], -1.0),
                                 axis=(0, 1)))
        tgt = jnp.full((slots,), slots, jnp.int32)
        nb_best_px = take(nb_best, rank)
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            p = shifted(rank, dy, dx)
            cand = jnp.where((p >= 0) & (p != rank)
                             & (take(size, p) == nb_best_px),
                             p, slots)
            tgt = jnp.minimum(
                tgt, jnp.min(jnp.where(oh > 0, cand[..., None], slots),
                             axis=(0, 1)))

        has = small & (tgt < slots) & (nb_best >= 0)
        tgt_safe = jnp.where(has, tgt, sid)
        t_size = jnp.sum(jax.nn.one_hot(tgt_safe, slots, dtype=jnp.float32)
                         * size[None, :], axis=1)
        # absorb into larger (or equal-size smaller-rank) only: terminates
        ok = has & ((t_size > size) | ((t_size == size) & (tgt_safe < sid)))
        nxt = jnp.where(ok, tgt_safe, sid)
        nxt_f = nxt.astype(jnp.float32)
        for _ in range(2):  # compose short absorption chains
            oh_n = jax.nn.one_hot(nxt_f.astype(jnp.int32), slots,
                                  dtype=jnp.float32)
            nxt_f = oh_n @ nxt_f
        return jnp.where(rank < 0, -1,
                         take(nxt_f, rank).astype(jnp.int32))

    rank = jax.lax.fori_loop(0, rounds, body, rank)

    # labels: smallest pixel index per slot; frozen (overflow) keep theirs
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    pix = (ys * width + xs).astype(jnp.float32)
    oh = jax.nn.one_hot(rank, slots, dtype=jnp.float32)
    mins = jnp.min(jnp.where(oh > 0, pix[..., None], float(n)), axis=(0, 1))
    lab = take(mins, rank).astype(jnp.int32)
    return jnp.where(rank < 0, root, lab)


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

    def body(state):
        root, _changed, it = state
        size = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), root,
                                   num_segments=n)
        root2d = root.reshape(height, width)
        r_right = jnp.concatenate([root2d[:, 1:], root2d[:, -1:]],
                                  axis=1).reshape(-1)
        r_down = jnp.concatenate([root2d[1:, :], root2d[-1:, :]],
                                 axis=0).reshape(-1)

        def boundary_entries(ra, rb):
            # neighbor roots come from plane shifts, not root[index] gathers
            diff = ra != rb
            small_a = diff & (size[ra] < min_size)
            small_b = diff & (size[rb] < min_size)
            keys = jnp.concatenate([jnp.where(small_a, ra, n - 1),
                                    jnp.where(small_b, rb, n - 1)])
            vals = jnp.concatenate([jnp.where(small_a, rb, n),
                                    jnp.where(small_b, ra, n)])
            return keys, vals

        k1, v1 = boundary_entries(root, r_right)
        k2, v2 = boundary_entries(root, r_down)
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
        # Depth cap 8: each composition is a serialized 1-element-row gather
        # on TPU (a full log2(n) ladder cost ~70 ms/img); small-fragment
        # absorption chains are almost always short, and deeper residue
        # resolves in the next while_loop round.
        for _ in range(3):
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
