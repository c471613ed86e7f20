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
