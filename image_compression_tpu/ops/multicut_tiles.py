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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _presolve_kernel(seed_ref, w_ref, out_ref, *, tile: int, rounds: int,
                     width: int, tw: int, block: int):
    """Pallas kernel: exact intra-tile GAEC for `block` tiles, VMEM-resident.

    Region ids are carried as float32 (exact below 2^24). Edge endpoint
    lookups and every dynamic gather g[idx] become one-hot matmuls on the MXU
    — TPU has no fast vector gather.

    STATUS: experimental. Numerically validated against tile_presolve (same
    partitions up to coin randomness) but currently ~3x slower than the XLA
    version on v5e — Mosaic lowers the small batched dot_generals poorly.
    tile_presolve (XLA) remains the production path; revisit with a device
    profile.

    w_ref: [block, Ep] intra-tile edge weights (Ep = padded edge count,
    horizontal row-major then vertical, zeros padding).
    out_ref: [block, S] global pixel root ids.
    """
    s = tile * tile
    ep = w_ref.shape[1]
    n_h = tile * (tile - 1)

    # static edge endpoints in local ids, built from iota arithmetic
    e = jax.lax.broadcasted_iota(jnp.int32, (ep, 1), 0)
    is_h = e < n_h
    is_v = (e >= n_h) & (e < 2 * n_h)
    u_h = (e // (tile - 1)) * tile + e % (tile - 1)
    f = e - n_h
    u_e = jnp.where(is_h, u_h, jnp.where(is_v, f, 0))
    v_e = jnp.where(is_h, u_h + 1, jnp.where(is_v, f + tile, 0))
    n_col_e = jax.lax.broadcasted_iota(jnp.int32, (ep, s), 1)
    u_mat = (n_col_e == u_e).astype(jnp.float32)      # [Ep, S]
    v_mat = (n_col_e == v_e).astype(jnp.float32)

    ids = jax.lax.broadcasted_iota(jnp.int32, (block, s), 1) \
        .astype(jnp.float32)  # [B, S]
    n_col = jax.lax.broadcasted_iota(jnp.int32, (block, s, s), 2) \
        .astype(jnp.float32)

    w_all = w_ref[:, :]

    def egather(root, mat):
        # root[b, u_e[e]] for all edges: [B, S] @ [S, Ep]
        return jax.lax.dot_general(
            root, mat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def ngather(vec, idx):
        # vec[b, idx[b, i]] via batched one-hot matmul
        oh = (n_col == idx[:, :, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, vec, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    prog = pl.program_id(0)
    tile_global = (prog * block
                   + jax.lax.broadcasted_iota(jnp.int32, (block, s), 0))

    root = ids

    for r in range(rounds):
        ru = egather(root, u_mat)        # [B, Ep]
        rv = egather(root, v_mat)
        active = ru != rv
        a = jnp.minimum(ru, rv)
        b = jnp.maximum(ru, rv)
        we = jnp.where(active, w_all, 0.0)

        # dense pair matrix, accumulated in edge chunks to bound VMEM.
        # NOTE: slice and expand separately — x[:, sl, None] lowers to a
        # gather, which Mosaic cannot vectorize.
        chunk = 128
        pair = jnp.zeros((block, s, s), jnp.float32)
        for c in range(ep // chunk):
            a_c = jnp.expand_dims(
                jax.lax.slice_in_dim(a, c * chunk, (c + 1) * chunk, axis=1), 2)
            b_c = jnp.expand_dims(
                jax.lax.slice_in_dim(b, c * chunk, (c + 1) * chunk, axis=1), 2)
            w_c = jnp.expand_dims(
                jax.lax.slice_in_dim(we, c * chunk, (c + 1) * chunk, axis=1), 2)
            n_c = jax.lax.broadcasted_iota(
                jnp.int32, (block, chunk, s), 2).astype(jnp.float32)
            a_oh = jnp.where(n_c == a_c, w_c, 0.0)
            b_oh = (n_c == b_c).astype(jnp.float32)
            pair = pair + jax.lax.dot_general(
                a_oh, b_oh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        sym = pair + jnp.swapaxes(pair, 1, 2)

        best = jnp.max(sym, axis=2)
        partner = jnp.min(
            jnp.where(sym == best[:, :, None], n_col, float(s)), axis=2)
        merge = best > 0.0
        partner = jnp.where(merge, partner, ids)

        pp = ngather(partner, partner)
        mutual = merge & (pp == ids)
        # platform-independent coin: murmur-style integer hash (int32 iota;
        # Mosaic has no f32->u32 cast)
        ids_u = jax.lax.broadcasted_iota(jnp.int32, (block, s), 1) \
            .astype(jnp.uint32)
        h = (ids_u
             + tile_global.astype(jnp.uint32) * jnp.uint32(7919)
             + seed_ref[0].astype(jnp.uint32)
             + jnp.uint32((r * 2654435761) % (1 << 32)))
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x7FEB352D)
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x846CA68B)
        h = h ^ (h >> 16)
        coin = (h & 1) == 0
        coin_at_partner = ngather(coin.astype(jnp.float32), partner) > 0.5
        tails = merge & ~coin & coin_at_partner
        mrg = mutual | tails

        nxt = jnp.where(mrg, partner, ids)
        nn = ngather(nxt, nxt)
        two_cycle = (nn == ids) & (ids < nxt)
        nxt = jnp.where(two_cycle, ids, nxt)
        nxt = ngather(nxt, nxt)
        nxt = ngather(nxt, nxt)
        root = ngather(nxt, root)

    # local root -> global pixel index
    ty = (tile_global // tw).astype(jnp.float32)
    tx = (tile_global % tw).astype(jnp.float32)
    row = jnp.floor(root / tile)
    col = root - row * tile
    gy = ty * tile + row
    gx = tx * tile + col
    out_ref[:, :] = (gy * width + gx).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "rounds", "interpret",
                                             "block"))
def tile_presolve_pallas(costs_hw2: jnp.ndarray, tile: int = 16,
                         rounds: int = 6, seed: int = 0,
                         interpret: bool = False,
                         block: int = 8) -> jnp.ndarray:
    """Pallas version of tile_presolve (see _presolve_kernel)."""
    height, width = costs_hw2.shape[:2]
    assert height % tile == 0 and width % tile == 0
    th, tw = height // tile, width // tile
    t_count = th * tw
    assert t_count % block == 0
    s = tile * tile

    w = _tile_weights(costs_hw2.astype(jnp.float32), tile)  # [T, 2*n_h]
    ep = -(-w.shape[1] // 128) * 128  # round up to lane multiple
    pad = ep - w.shape[1]
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))

    kernel = functools.partial(_presolve_kernel, tile=tile, rounds=rounds,
                               width=width, tw=tw, block=block)
    root = pl.pallas_call(
        kernel,
        grid=(t_count // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, ep), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_count, s), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), w)

    # [T, S] -> [H, W]
    return (root.reshape(th, tw, tile, tile)
            .transpose(0, 2, 1, 3).reshape(height, width))


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
