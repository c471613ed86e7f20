"""Dense tile-level GAEC presolve for the grid multicut solver.

Multilevel scheme (the TPU mapping of RAMA's parallel contraction): first
contract *within* VMEM-sized tiles, where the region-pair cost matrix of a
tile is small enough to hold densely — pair aggregation becomes a batched
one-hot matmul on the MXU and best-partner selection a dense argmax, with NO
sorts and NO large segment reductions. Every merge uses exact aggregated
costs because re-aggregation per round is nearly free at this scale.

After the presolve, the remaining work (regions spanning tile boundaries) is
handled by the sorted global rounds in ops/multicut.py, which start from a
few-thousand-region problem instead of 65k singletons.

This module now backs only the sorted FALLBACK path (images not divisible
by the hier base, and the mutual/hybrid modes); the default solve
generalizes the same dense one-hot-matmul contraction to a full multilevel
hierarchy in ops/multicut_hier.py. An experimental Pallas twin of this
presolve was profiled at ~3x slower than the XLA lowering on v5e (Mosaic
handled the small batched dot_generals poorly) and was deleted rather than
shipped as dead weight — see BENCHMARKS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _tile_local_edges(tile: int) -> tuple[np.ndarray, np.ndarray]:
    """Intra-tile edge endpoints in local ids [0, tile^2): horizontal edges
    row-major then vertical (matching the weight layout below)."""
    ys, xs = np.mgrid[0:tile, 0:tile]
    base = (ys * tile + xs).astype(np.int32)
    u_h = base[:, :-1].reshape(-1)
    v_h = (base[:, :-1] + 1).reshape(-1)
    u_v = base[:-1, :].reshape(-1)
    v_v = (base[:-1, :] + tile).reshape(-1)
    return (np.concatenate([u_h, u_v]), np.concatenate([v_h, v_v]))


def _tile_weights(costs_hw2: jnp.ndarray, tile: int) -> jnp.ndarray:
    """[H, W, 2] -> [T, Et] intra-tile edge weights, T tiles row-major,
    edge order matching _tile_local_edges."""
    height, width = costs_hw2.shape[:2]
    th, tw = height // tile, width // tile
    t_count = th * tw

    def tiles_of(plane):
        return (plane.reshape(th, tile, tw, tile)
                .transpose(0, 2, 1, 3).reshape(t_count, tile, tile))

    ch = tiles_of(costs_hw2[..., 0])
    cv = tiles_of(costs_hw2[..., 1])
    w_h = ch[:, :, :-1].reshape(t_count, -1)
    w_v = cv[:, :-1, :].reshape(t_count, -1)
    return jnp.concatenate([w_h, w_v], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile", "rounds"))
def tile_presolve(costs_hw2: jnp.ndarray, tile: int = 16,
                  rounds: int = 6) -> jnp.ndarray:
    """Intra-tile GAEC contraction. Returns root [H, W] int32 in global pixel
    ids (each region's smallest pixel index within its tile).

    Requires H and W divisible by tile.
    """
    height, width = costs_hw2.shape[:2]
    assert height % tile == 0 and width % tile == 0
    th, tw = height // tile, width // tile
    t_count = th * tw
    s = tile * tile

    w = _tile_weights(costs_hw2.astype(jnp.float32), tile)  # [T, Et]

    ids = jnp.arange(s, dtype=jnp.int32)

    def endpoints(root):
        # plane slices instead of gathers (TPU serializes 1-element-row
        # gathers); edge order matches _tile_local_edges
        r3 = root.reshape(t_count, tile, tile)
        ru = jnp.concatenate([r3[:, :, :-1].reshape(t_count, -1),
                              r3[:, :-1, :].reshape(t_count, -1)], axis=1)
        rv = jnp.concatenate([r3[:, :, 1:].reshape(t_count, -1),
                              r3[:, 1:, :].reshape(t_count, -1)], axis=1)
        return ru, rv

    def one_round(r, root):
        ru, rv = endpoints(root)  # [T, Et]
        active = ru != rv
        a = jnp.minimum(ru, rv)
        b = jnp.maximum(ru, rv)
        we = jnp.where(active, w, 0.0)

        # dense pair-cost matrix per tile via one-hot contraction (MXU)
        oh_a = jax.nn.one_hot(a, s, dtype=jnp.float32) * we[..., None]
        oh_b = jax.nn.one_hot(b, s, dtype=jnp.float32)
        pair = jnp.einsum("tea,teb->tab", oh_a, oh_b,
                          preferred_element_type=jnp.float32)
        sym = pair + jnp.swapaxes(pair, 1, 2)  # [T, S, S]

        best = jnp.max(sym, axis=-1)                       # [T, S]
        partner = jnp.argmax(sym, axis=-1).astype(jnp.int32)
        merge = best > 0.0
        partner_safe = jnp.where(merge, partner, 0)

        def take(arr, idx):
            # batched vec[b, idx[b, i]] as a one-hot matmul: dynamic gathers
            # serialize on TPU, a [T,S,S] bf16 one-hot contraction does not.
            # Values here are ids < 2^16 or booleans: exact in f32.
            oh = jax.nn.one_hot(idx, s, dtype=jnp.bfloat16)
            out = jnp.einsum("tij,tj->ti", oh,
                             arr.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            return out.astype(arr.dtype)

        mutual = merge & (take(partner, partner_safe) == ids[None])
        coin = jax.random.bernoulli(
            jax.random.fold_in(jax.random.PRNGKey(2), r), 0.5,
            (t_count, s))
        tails = merge & ~coin & (take(coin, partner_safe) > 0.5)
        merge = mutual | tails

        nxt = jnp.where(merge, partner, ids[None])
        two_cycle = (take(nxt, nxt) == ids[None]) & (ids[None] < nxt)
        nxt = jnp.where(two_cycle, ids[None], nxt)
        nxt = take(nxt, nxt)
        nxt = take(nxt, nxt)
        return take(nxt, root)

    root = jnp.broadcast_to(ids[None], (t_count, s))
    root = jax.lax.fori_loop(0, rounds, one_round, root)

    # local roots -> global pixel indices
    t_idx = jnp.arange(t_count, dtype=jnp.int32)
    ty = t_idx // tw
    tx = t_idx % tw
    gy = ty[:, None] * tile + root // tile
    gx = tx[:, None] * tile + root % tile
    global_root = gy * width + gx  # [T, S]
    # scatter back into image layout
    img = (global_root.reshape(th, tw, tile, tile)
           .transpose(0, 2, 1, 3).reshape(height, width))
    return img.astype(jnp.int32)


def boundary_edges(height: int, width: int,
                   tile: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (u, v, plane_slot) for grid edges crossing tile boundaries.

    plane_slot indexes the flattened [H, W, 2] cost layout so weights can be
    gathered from the cost planes.
    """
    ys, xs = np.mgrid[0:height, 0:width]
    base = ys * width + xs
    slot = base * 2  # horizontal plane slot at (y, x)
    h_cross = (xs % tile == tile - 1) & (xs + 1 < width)
    v_cross = (ys % tile == tile - 1) & (ys + 1 < height)
    u = np.concatenate([base[h_cross], base[v_cross]]).astype(np.int32)
    v = np.concatenate([base[h_cross] + 1, base[v_cross] + width]) \
        .astype(np.int32)
    w_slot = np.concatenate([slot[h_cross], slot[v_cross] + 1]).astype(np.int32)
    return u, v, w_slot
