"""Spatial sharding for high-resolution images: shard_map + halo exchange.

The reference is resolution-bound: RL hardcodes a 256x256 edge list
(training.cpp:85-91) and compress is single-image. On TPU the analogous
scale axis is image size (SURVEY.md section 5, long-context analogue): when
H x W exceeds one core's working set, shard the HEIGHT axis of the image
across the mesh and run stencil ops (blur/Sobel/local extractors) on tiles,
exchanging one-row halos over ICI with collective permutes.

`halo_map` wraps any per-tile stencil function with a halo exchange so the
tiles compute exactly what the unsharded op would. The U-Net itself stays
data-parallel (7.7M params fit everywhere); spatial sharding applies to the
classical extractors and cost planes feeding multicut.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def exchange_halo(tile: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a height-sharded tile [h_loc, W, ...] with `halo` rows from the
    mesh neighbors (edge-replicated at the global boundary)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    top_rows = tile[:halo]       # rows my upper neighbor needs
    bottom_rows = tile[-halo:]   # rows my lower neighbor needs

    # send bottom rows downward (neighbor i receives from i-1)
    from_above = jax.lax.ppermute(
        bottom_rows, axis_name,
        [(i, i + 1) for i in range(n - 1)])
    # send top rows upward (neighbor i receives from i+1)
    from_below = jax.lax.ppermute(
        top_rows, axis_name,
        [(i + 1, i) for i in range(n - 1)])

    # global boundary: replicate the edge rows (matches jnp.pad mode="edge");
    # stencils that need zero or reflect padding adjust inside their fn
    top_fill = jnp.repeat(tile[:1], halo, axis=0)
    bottom_fill = jnp.repeat(tile[-1:], halo, axis=0)
    top = jnp.where(idx == 0, top_fill, from_above)
    bottom = jnp.where(idx == n - 1, bottom_fill, from_below)
    return jnp.concatenate([top, tile, bottom], axis=0)


def halo_map(fn: Callable, mesh: Mesh, halo: int,
             axis_name: str = "data") -> Callable:
    """Lift a stencil `fn(tile_with_halo) -> out_with_halo` into a
    height-sharded SPMD function over [H, W, ...] arrays.

    fn receives the local tile padded with `halo` rows on both sides and must
    return an array of the same (padded) height; the wrapper crops the halo
    back off. Radius-`halo` stencils compute exactly the unsharded result.
    """

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(axis_name), out_specs=P(axis_name))
    def wrapped(x):
        padded = exchange_halo(x, halo, axis_name)
        out = fn(padded)
        return out[halo:-halo]

    return wrapped


def multicut_grid_spatial(costs_hw2: jnp.ndarray, mesh: Mesh,
                          axis_name: str = "data",
                          mode: str = "chain",
                          rounds_per_level=None, caps=None,
                          agg: str = "pixel") -> jnp.ndarray:
    """Spatially sharded hierarchical multicut: one high-resolution image
    solved across the mesh (SURVEY section 5's scale axis; beats the
    reference's fixed-256 grid, training.cpp:85-91).

    Key property that makes this exact with NO halo exchange: the dense
    hierarchy (ops/multicut_hier.py) zeroes every edge crossing a supertile
    boundary at levels whose side s divides the strip height, so for a
    HEIGHT-sharded image all levels with s <= H/n_devices are strictly
    strip-local — each device runs them on its own strip and merges
    identically to the unsharded run. The remaining coarse levels (side >
    strip height) then continue from the gathered state via hier_gaec's
    start_level entry; their merges involve cross-strip regions and run on
    the gathered (replicated) state. Per-device pixel-space work for the
    local levels drops by n_devices; agg="matrix" (ops/multicut_hier.py)
    runs that continuation in slot space with the strips' carried pair
    matrices and min-pixel vectors handed over NATIVELY (no pixel-space
    rebuild at all — only [T, S, S] matmuls and one slot-map apply per
    level remain above the strips), making the sharded matrix solve
    bit-identical to the unsharded one by construction.

    Labels equal multicut_grid(costs, icm_sweeps=0)'s exactly, including
    frozen regions: freezing labels a region by its smallest pixel index,
    and the strip-local index plus the strip's row offset IS the global
    smallest pixel index (a strip-frozen region lies within one strip).

    Requires: H divisible by n_devices, strip height divisible by 8, and a
    hierarchy whose top tile covers the image (square power-of-two sizes).
    """
    from image_compression_tpu.ops.multicut_hier import (
        default_caps, hier_gaec, lean_caps, plan_levels,
        smallest_pixel_labels)

    height, width = costs_hw2.shape[:2]
    n_dev = mesh.shape[axis_name]
    h_loc = height // n_dev
    if height % n_dev or h_loc % 8:
        raise ValueError(f"height {height} not shardable over {n_dev}")
    sides = plan_levels(height, width, 8)
    if not sides or sides[-1] != height or height != width:
        raise ValueError("spatial multicut needs a hierarchy covering the "
                         f"image; got sides={sides} for {height}x{width}")
    if isinstance(caps, str):
        caps = lean_caps(sides, caps)
    caps_full = list(caps) if caps is not None else default_caps(sides)
    n_local = len(plan_levels(h_loc, width, 8))  # strictly strip-local levels
    rpl = list(rounds_per_level) if rounds_per_level is not None else None

    matrix = agg == "matrix"
    n_out = 6 if matrix else 4

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(axis_name),
        out_specs=tuple([P(axis_name)] * n_out),
        # the fused Pallas leaf (ops/multicut_leaf.py) runs inside this
        # shard_map; pallas_call outputs carry no varying-mesh-axes info,
        # which check_vma=True rejects outright. The pixel path never
        # selects the leaf, so it keeps the safety check.
        check_vma=not matrix)
    def local_levels(costs_strip):
        res = hier_gaec(costs_strip, mode=mode,
                        rounds_per_level=rpl[:n_local] if rpl else None,
                        caps=caps_full[:n_local], agg=agg)
        # frozen regions are labeled by their smallest pixel index in STRIP
        # coordinates; adding the strip's first global pixel index yields
        # exactly the unsharded labeling
        strip = jax.lax.axis_index(axis_name)
        gid = jnp.where(res.frozen,
                        strip * h_loc * width + res.final_gid, 0)
        if not matrix:
            return res.rank_img, res.n_regions[None, :], res.frozen, gid
        # native slot-space handoff: translate the strips' min-pixel vectors
        # to global pixel ids (live slots shift by the strip's first pixel
        # index — exact in f32 below 2^24; dead slots take the global
        # sentinel H*W) and ship the carried pair matrices as-is. Tiles are
        # row-major, strips hold consecutive row blocks, so stacking strips
        # along the tile axis IS the global tile order.
        local_sentinel = float(h_loc * width)
        m_global = jnp.where(
            res.minpix < local_sentinel,
            res.minpix + (strip * h_loc * width).astype(jnp.float32),
            float(height * width))
        return (res.rank_img, res.n_regions[None, :], res.frozen, gid,
                res.pair, m_global)

    out = local_levels(costs_hw2)
    rank_img, ncand_2d, frozen, final_gid = out[:4]
    # gathered per-tile live counts, global row-major tile order: each strip
    # contributed one [T_loc] row, strips stack along axis 0
    ncand = ncand_2d.reshape(-1)
    state = (rank_img, ncand, frozen, final_gid,
             jnp.int32(0))  # overflow restarts; strips counted theirs
    if matrix:
        # 7-tuple init_state: the continuation resumes in slot space with no
        # pixel rebuild and is bit-identical to the unsharded matrix run
        state = state + (out[4], out[5])
    res = hier_gaec(costs_hw2, mode=mode, rounds_per_level=rpl, caps=caps_full,
                    start_level=n_local, init_state=state, agg=agg)
    return smallest_pixel_labels(res)


def sharded_edge_costs(images_hw3: jnp.ndarray, mesh: Mesh, halo: int = 8,
                       axis_name: str = "data") -> jnp.ndarray:
    """Example spatially-sharded extractor: Canny edge costs over a
    height-sharded high-resolution image. halo=8 covers the blur+Sobel+NMS+
    a-few-hysteresis-steps stencil radius; hysteresis linking beyond the halo
    is approximated tile-locally (documented deviation for the sharded path).
    """
    from image_compression_tpu.ops.canny import canny_edge_costs

    def tile_fn(tile):
        return canny_edge_costs(tile)

    return halo_map(tile_fn, mesh, halo, axis_name)(images_hw3)
