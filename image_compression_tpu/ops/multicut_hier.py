"""Hierarchical dense GAEC: the sort-free multicut contraction path.

Round-1 profiling showed the sorted global rounds of ops/multicut.py dominate
the compress budget (~9 ms/img per round on v5e): a 2*H*W-key sort plus
pixel-space (n = H*W) segment reductions and pointer-jump gathers per round,
all of which serialize badly on TPU. This module replaces them with a
multilevel scheme in which NOTHING is ever sorted, scattered, or gathered in
pixel space:

  * the image is covered by supertiles whose side doubles per level
    (8 -> 16 -> 32 -> ... -> min(H, W));
  * within a supertile, regions are *rank-compacted* to a static slot count S,
    so the per-pair aggregated-cost matrix [S, S] is dense and small;
  * pair aggregation is a one-hot matmul over the supertile's grid edges
    (MXU), best-partner selection a dense argmax, and every id lookup a
    slot-space one-hot matmul — the exact ops TPU is fastest at;
  * pixels carry their region's rank within the current supertile; the level
    transition is ELEMENTWISE (new rank = subtile rank + per-subtile offset),
    because compaction keeps ranks dense in [0, n_regions).

Each level's rounds recompute exact aggregated pair costs from the original
edge weights, preserving the GAEC semantics of the reference's RAMA solver
(rama_wrapper.cu:52-127; parallel contraction per arXiv:2109.01838).

Slot-cap overflow (more regions in a supertile than S slots) FREEZES the
surplus regions: a frozen region takes no further part in any merge (its
pixels carry rank -1, whose one-hot rows are zero) and is emitted unchanged
in the final labeling, labeled by its SMALLEST PIXEL INDEX — computed at
freeze time with the same masked one-hot min `smallest_pixel_labels` uses —
so the public minlabel contract holds for every region, frozen or not (and
the sort-free segment-stats path stays valid with icm_sweeps=0, where no
connectivity relabel runs). Freezing can only cost objective (a merge not
taken), never correctness — the all-negative-costs "everything stays a
singleton" invariant holds exactly. Caps are sized so freezing is rare on
real cost fields; `hier_gaec` reports how many regions froze.

Precision: pair matmuls use bf16 one-hots carrying bf16-rounded edge weights
with float32 MXU accumulation (documented divergence: weights quantized to
bf16, <0.4% each, for half the HBM traffic — merge decisions are threshold
comparisons and the final objective is evaluated in f32). Pixel-id-valued
lookups use f32 one-hots (ids < 2^24 exact); rank-valued lookups and
gating-only one-hots use bf16 (integers <= 256 and 0/1 are exact in bf16,
at half the [T, P, S] pixel-space traffic — `_take_ranks`).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class HierResult(NamedTuple):
    rank_img: jnp.ndarray   # [H, W] int32 rank within its top tile; -1 frozen
    n_regions: jnp.ndarray  # [T_top] int32 live regions per top-level tile
    frozen: jnp.ndarray     # [H, W] bool: pixel belongs to a frozen region
    final_gid: jnp.ndarray  # [H, W] int32 where frozen: the region's
    #                         smallest pixel index (minlabel contract)
    overflow: jnp.ndarray   # scalar int32: total regions frozen
    top_tile: int           # side of the top-level supertile (static)
    top_slots: int          # slot cap at the top level (static)
    minpix: jnp.ndarray | None = None  # [T_top, S] f32 min pixel id per live
    #                         slot (agg="matrix" only; pixel ids < 2^24 exact)
    pair: jnp.ndarray | None = None  # [T_top, S, S] f32 aggregated pair-cost
    #                         matrix (agg="matrix" only) — lets the spatially
    #                         sharded continuation resume in slot space
    #                         without a pixel-space rebuild


def _to_tiles(img: jnp.ndarray, s: int) -> jnp.ndarray:
    """[H, W] -> [T, s*s], tiles row-major."""
    height, width = img.shape
    return (img.reshape(height // s, s, width // s, s)
            .transpose(0, 2, 1, 3).reshape(-1, s * s))


def _from_tiles(tiles: jnp.ndarray, height: int, width: int,
                s: int) -> jnp.ndarray:
    """[T, s*s] -> [H, W]."""
    return (tiles.reshape(height // s, width // s, s, s)
            .transpose(0, 2, 1, 3).reshape(height, width))


def _take_slots(vec: jnp.ndarray, idx: jnp.ndarray, slots: int) -> jnp.ndarray:
    """vec[t, idx[t, i]] via a one-hot matmul (no serialized gathers).

    vec: [T, S] float32 values exact in f32 (ids/flags), idx: [T, I].
    """
    oh = jax.nn.one_hot(idx, slots, dtype=jnp.float32)
    return jnp.einsum("tis,ts->ti", oh, vec,
                      preferred_element_type=jnp.float32)


def _take_ranks(vec: jnp.ndarray, idx: jnp.ndarray, slots: int) -> jnp.ndarray:
    """_take_slots for RANK-VALUED vec: bf16 one-hot and values with f32
    accumulation — exact because ranks are integers < slots <= 256 (all
    integers <= 256 are bf16-representable) and one-hot rows are 0/1, but
    half the HBM traffic of the f32 one-hot on the [T, P, S] pixel-space
    applies. Falls back to f32 when slots > 256 (deep default_caps levels
    reach 320, where e.g. 257 is not bf16-representable)."""
    if slots > 256:
        return _take_slots(vec, idx, slots)
    oh = jax.nn.one_hot(idx, slots, dtype=jnp.bfloat16)
    return jnp.einsum("tis,ts->ti", oh, vec.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _level_weights(costs_hw2: jnp.ndarray, s: int) -> jnp.ndarray:
    """Edge weights [T, E] for one level: all grid edges, zeroed where the
    edge crosses a supertile boundary (those activate at higher levels) or is
    a padding slot. E = 2*s*s, horizontal plane then vertical."""
    height, width = costs_hw2.shape[:2]
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    wh = jnp.where((xs % s != s - 1) & (xs + 1 < width),
                   costs_hw2[..., 0], 0.0)
    wv = jnp.where((ys % s != s - 1) & (ys + 1 < height),
                   costs_hw2[..., 1], 0.0)
    return jnp.concatenate([_to_tiles(wh, s), _to_tiles(wv, s)], axis=1)


def _edge_endpoint_ranks(rank_img: jnp.ndarray,
                         s: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Current rank of each edge's endpoints, [T, 2*s*s] each, via plane
    shifts (tile-crossing edges read a neighboring tile's rank, but their
    weight is zero so they never participate)."""
    height, width = rank_img.shape
    right = jnp.concatenate([rank_img[:, 1:], rank_img[:, -1:]], axis=1)
    down = jnp.concatenate([rank_img[1:, :], rank_img[-1:, :]], axis=0)
    a = jnp.concatenate([_to_tiles(rank_img, s), _to_tiles(rank_img, s)],
                        axis=1)
    b = jnp.concatenate([_to_tiles(right, s), _to_tiles(down, s)], axis=1)
    return a, b


def _dense_rounds(rank_img: jnp.ndarray, w_e: jnp.ndarray, s: int,
                  slots: int, rounds: int, mode: str,
                  level_salt: int,
                  identity_first: bool = False) -> tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """GAEC rounds at one level. rank_img [H, W] with ranks in [0, slots).
    Returns (rank_img, n_alive [T]) with ranks re-compacted to be dense.

    identity_first: entry ranks are the identity (level 0, fresh start), so
    round 0's pair matrix needs no one-hot aggregation at all — it is the
    horizontal weights on the +1 band and the vertical weights on the +s
    band (one edge per pair => bitwise equal to the einsum)."""
    height, width = rank_img.shape
    t_count = (height // s) * (width // s)
    ids = jnp.arange(slots, dtype=jnp.int32)[None, :]  # [1, S]
    ids_f = ids.astype(jnp.float32)
    w_bf = w_e.astype(jnp.bfloat16)

    def one_round(r, rank_img):
        if identity_first and r == 0 and slots == s * s:
            whb = w_bf[:, :s * s].astype(jnp.float32)   # zeroed at crossings
            wvb = w_bf[:, s * s:].astype(jnp.float32)
            rr = jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (slots, slots), 1)
            band_r = ((cc == rr + 1) & (rr % s != s - 1)
                      ).astype(jnp.float32)              # p -> p+1
            band_d = (cc == rr + s).astype(jnp.float32)  # p -> p+s
            sym = (whb[:, :, None] * band_r[None]
                   + wvb[:, :, None] * band_d[None]
                   + whb[:, None, :] * band_r.T[None]
                   + wvb[:, None, :] * band_d.T[None])
            return _round_body(r, rank_img, sym)
        a, b = _edge_endpoint_ranks(rank_img, s)
        active = (a != b) & (w_e != 0.0)
        we = jnp.where(active, w_bf, jnp.bfloat16(0))

        # dense pair-cost matrix per tile on the MXU (bf16 in, f32 out)
        oh_aw = jax.nn.one_hot(a, slots, dtype=jnp.bfloat16) * we[..., None]
        oh_b = jax.nn.one_hot(b, slots, dtype=jnp.bfloat16)
        pair = jnp.einsum("tea,teb->tab", oh_aw, oh_b,
                          preferred_element_type=jnp.float32)
        sym = pair + jnp.swapaxes(pair, 1, 2)  # [T, S, S]
        return _round_body(r, rank_img, sym)

    def _round_body(r, rank_img, sym):
        best = jnp.max(sym, axis=-1)                        # [T, S]
        partner = jnp.argmax(sym, axis=-1).astype(jnp.int32)
        merge = best > 0.0
        partner_safe = jnp.where(merge, partner, 0)

        pp = _take_slots(partner.astype(jnp.float32), partner_safe, slots)
        mutual = merge & (pp == ids_f)
        if mode == "mutual":
            merge = mutual
        elif mode == "random_mate":
            coin = jax.random.bernoulli(
                jax.random.fold_in(jax.random.PRNGKey(3), level_salt + r),
                0.5, (t_count, slots))
            tails = merge & ~coin & (_take_slots(
                coin.astype(jnp.float32), partner_safe, slots) > 0.5)
            merge = mutual | tails
        # mode == "chain": hook everything

        nxt = jnp.where(merge, partner, ids)
        nn = _take_slots(nxt.astype(jnp.float32), nxt, slots)
        two_cycle = (nn == ids_f) & (ids < nxt)
        nxt = jnp.where(two_cycle, ids, nxt)
        doublings = 3 if mode == "chain" else 2
        nxt_f = nxt.astype(jnp.float32)
        for _ in range(doublings):
            nxt_f = _take_slots(nxt_f, nxt_f.astype(jnp.int32), slots)

        # apply the slot map to pixel ranks (one-hot matmul, no gathers);
        # frozen pixels (rank -1, all-zero one-hot row) stay frozen
        ranks_t = _to_tiles(rank_img, s)
        new_t = jnp.where(ranks_t < 0, -1,
                          _take_ranks(nxt_f, ranks_t, slots).astype(jnp.int32))
        return _from_tiles(new_t, height, width, s)

    for r in range(rounds):
        rank_img = one_round(r, rank_img)

    # --- compact: re-rank live slots densely --------------------------------
    ranks_t = _to_tiles(rank_img, s)
    # a slot is live iff some non-frozen pixel carries it (0/1 one-hot is
    # exact in bf16; halves the [T, P, S] pixel-space traffic)
    alive = jnp.max(jax.nn.one_hot(ranks_t, slots, dtype=jnp.bfloat16),
                    axis=1) > 0                             # [T, S]
    new_rank = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    n_alive = new_rank[:, -1] + 1
    g = jnp.where(ranks_t < 0, -1,
                  _take_ranks(new_rank.astype(jnp.float32), ranks_t,
                              slots).astype(jnp.int32))
    return _from_tiles(g, height, width, s), n_alive


# ---------------------------------------------------------------------------
# agg="matrix": slot-space pair-matrix aggregation
#
# The pixel path above re-aggregates the dense pair matrix from pixel-space
# one-hot matmuls EVERY round ([T, 2*s*s, S] one-hots -> the dominant HBM
# term of the solve). The matrix path aggregates from pixels exactly once
# per leaf and thereafter keeps the per-tile pair matrix itself as the
# state: a merge round is P <- M^T P M (two tiny [T, S, S] matmuls), the
# level transition embeds the four child matrices with their rank offsets
# and adds only the newly active edges (the two mid-lines of each new tile,
# [T, 2s] edges instead of [T, 2*s*s]). Per-pixel work drops to ONE slot-map
# apply per level. Merge decisions are identical to the pixel path under
# exact arithmetic (bf16 leaf weights, f32 sums; sums are regrouped, so
# real-valued costs can differ by f32 rounding — integer-valued costs are
# bit-identical, which is what tests/test_multicut.py asserts).
#
# Min-pixel ids ride along as a per-slot vector m [T, S] (f32, exact below
# 2^24): merges take the masked min, freezing reads the frozen region's
# label straight out of m, and the final labeling is a single slot lookup —
# no pixel-space one-hot mins anywhere.
# ---------------------------------------------------------------------------


def _pair_from_pixels(rank_img: jnp.ndarray, costs_f32: jnp.ndarray, s: int,
                      slots: int) -> jnp.ndarray:
    """Aggregate the symmetric zero-diagonal pair-cost matrix [T, S, S] from
    pixel state at supertile side s (the leaf aggregation; also the rebuild
    entry for the spatially sharded continuation)."""
    w_e = _level_weights(costs_f32, s)
    a, b = _edge_endpoint_ranks(rank_img, s)
    active = (a != b) & (w_e != 0.0)
    we = jnp.where(active, w_e.astype(jnp.bfloat16), jnp.bfloat16(0))
    oh_aw = jax.nn.one_hot(a, slots, dtype=jnp.bfloat16) * we[..., None]
    oh_b = jax.nn.one_hot(b, slots, dtype=jnp.bfloat16)
    pair = jnp.einsum("tea,teb->tab", oh_aw, oh_b,
                      preferred_element_type=jnp.float32)
    sym = pair + jnp.swapaxes(pair, 1, 2)
    return sym * (1.0 - jnp.eye(slots, dtype=sym.dtype))


def _minpix_from_pixels(rank_img: jnp.ndarray, s: int,
                        slots: int) -> jnp.ndarray:
    """Per-slot smallest pixel id [T, S] from pixel state (rebuild entry;
    dead slots carry the sentinel H*W)."""
    height, width = rank_img.shape
    n = height * width
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    pix_t = _to_tiles(ys * width + xs, s).astype(jnp.float32)
    # the one-hot only gates the masked min (oh > 0): 0/1 is exact in
    # bf16 at half the [T, P, S] traffic
    oh = jax.nn.one_hot(_to_tiles(rank_img, s), slots, dtype=jnp.bfloat16)
    return jnp.min(jnp.where(oh > 0, pix_t[..., None], float(n)), axis=1)


def _matrix_rounds(sym: jnp.ndarray, m: jnp.ndarray, slots: int, rounds: int,
                   mode: str, level_salt: int, sentinel: float
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """GAEC rounds entirely in slot space, then dense re-ranking.

    Returns (sym, m, cmap, n_alive): cmap [T, S] maps entry ranks to the
    final dense ranks (values for entry-dead slots are garbage — no pixel
    carries them). Decision logic mirrors _dense_rounds.one_round exactly,
    including random_mate's per-(tile, round) coin keys."""
    t_count = sym.shape[0]
    ids = jnp.arange(slots, dtype=jnp.int32)[None, :]
    ids_f = ids.astype(jnp.float32)
    eye = jnp.eye(slots, dtype=sym.dtype)
    cmap = jnp.broadcast_to(ids_f, (t_count, slots))

    for r in range(rounds):
        best = jnp.max(sym, axis=-1)                        # [T, S]
        partner = jnp.argmax(sym, axis=-1).astype(jnp.int32)
        merge = best > 0.0
        partner_safe = jnp.where(merge, partner, 0)

        pp = _take_slots(partner.astype(jnp.float32), partner_safe, slots)
        mutual = merge & (pp == ids_f)
        if mode == "mutual":
            merge = mutual
        elif mode == "random_mate":
            coin = jax.random.bernoulli(
                jax.random.fold_in(jax.random.PRNGKey(3), level_salt + r),
                0.5, (t_count, slots))
            tails = merge & ~coin & (_take_slots(
                coin.astype(jnp.float32), partner_safe, slots) > 0.5)
            merge = mutual | tails
        # mode == "chain": hook everything

        nxt = jnp.where(merge, partner, ids)
        nn = _take_slots(nxt.astype(jnp.float32), nxt, slots)
        two_cycle = (nn == ids_f) & (ids < nxt)
        nxt = jnp.where(two_cycle, ids, nxt)
        doublings = 3 if mode == "chain" else 2
        nxt_f = nxt.astype(jnp.float32)
        for _ in range(doublings):
            nxt_f = _take_slots(nxt_f, nxt_f.astype(jnp.int32), slots)

        mm = jax.nn.one_hot(nxt_f.astype(jnp.int32), slots,
                            dtype=jnp.float32)                # [T, S, S]
        x = jnp.einsum("tab,tbB->taB", sym, mm,
                       preferred_element_type=jnp.float32)
        sym = jnp.einsum("taA,taB->tAB", mm, x,
                         preferred_element_type=jnp.float32)
        sym = sym * (1.0 - eye)  # intra-region mass, = pixel path's a != b
        m = jnp.min(jnp.where(mm > 0, m[:, :, None], sentinel), axis=1)
        cmap = _take_slots(nxt_f, cmap.astype(jnp.int32), slots)

    # --- compact: re-rank live slots densely (live iff it has a pixel,
    # i.e. carries a finite min-pixel id) --------------------------------
    alive = m < sentinel
    new_rank = jnp.cumsum(alive.astype(jnp.int32), axis=1) - 1
    n_alive = new_rank[:, -1] + 1
    cc = jax.nn.one_hot(jnp.where(alive, new_rank, -1), slots,
                        dtype=jnp.float32)
    x = jnp.einsum("tab,tbB->taB", sym, cc, preferred_element_type=jnp.float32)
    sym = jnp.einsum("taA,taB->tAB", cc, x, preferred_element_type=jnp.float32)
    m = jnp.min(jnp.where(cc > 0, m[:, :, None], sentinel), axis=1)
    cmap = _take_slots(new_rank.astype(jnp.float32), cmap.astype(jnp.int32),
                       slots)
    return sym, m, cmap, n_alive


def _matrix_transition(rank_img, ncand, sym, m, frozen, final_gid, overflow,
                       costs_f32, prev_s: int, prev_slots: int, s: int,
                       slots: int):
    """Level transition in slot space: offset child ranks, freeze overflow
    (labels straight from m), embed the four child pair matrices, and add
    only the newly active mid-line edges."""
    height, width = rank_img.shape
    n = height * width
    th_p, tw_p = height // prev_s, width // prev_s
    th_n, tw_n = height // s, width // s
    counts = ncand.reshape(th_p, tw_p)
    c00 = counts[0::2, 0::2]
    c01 = counts[0::2, 1::2]
    c10 = counts[1::2, 0::2]
    c11 = counts[1::2, 1::2]

    # pixel-space candidate ranks (same quad arrangement as the pixel path)
    off = jnp.stack([
        jnp.stack([jnp.zeros_like(c00), c00], -1),
        jnp.stack([c00 + c01, c00 + c01 + c10], -1),
    ], -2)
    off_prev = off.transpose(0, 2, 1, 3).reshape(th_p, tw_p)
    off_img = jnp.repeat(jnp.repeat(off_prev, prev_s, axis=0),
                         prev_s, axis=1)
    cand_img = rank_img + off_img
    newly = ~frozen & (rank_img >= 0) & (cand_img >= slots)
    # the frozen region's minlabel is already in m — one slot lookup
    ranks_pt = _to_tiles(rank_img, prev_s)
    minpix_t = _take_slots(m, jnp.maximum(ranks_pt, 0), prev_slots)
    minpix = _from_tiles(minpix_t, height, width, prev_s).astype(jnp.int32)
    final_gid = jnp.where(newly, minpix, final_gid)
    frozen = frozen | newly
    rank_img = jnp.where(frozen, -1, cand_img)
    overflow = overflow + jnp.sum(jnp.maximum(
        (c00 + c01 + c10 + c11).reshape(-1) - slots, 0))

    # embed the four child matrices with their rank offsets; candidates
    # >= slots (frozen) get all-zero one-hot rows and drop out. Dead child
    # slots may collide with a neighbor quad's range, but their rows are
    # zero and their m is the sentinel, so they contribute nothing.
    off4 = jnp.stack([jnp.zeros_like(c00), c00, c00 + c01,
                      c00 + c01 + c10], axis=-1).reshape(-1, 4)  # [T', 4]
    p4 = (sym.reshape(th_n, 2, tw_n, 2, prev_slots, prev_slots)
          .transpose(0, 2, 1, 3, 4, 5)
          .reshape(-1, 4, prev_slots, prev_slots))
    m4 = (m.reshape(th_n, 2, tw_n, 2, prev_slots)
          .transpose(0, 2, 1, 3, 4).reshape(-1, 4, prev_slots))
    cand_slot = (jnp.arange(prev_slots, dtype=jnp.int32)[None, None, :]
                 + off4[:, :, None])
    emb = jax.nn.one_hot(cand_slot, slots, dtype=jnp.float32)  # [T',4,Sp,S]
    x = jnp.einsum("tqab,tqbB->tqaB", p4, emb,
                   preferred_element_type=jnp.float32)
    sym_new = jnp.einsum("tqaA,tqaB->tAB", emb, x,
                         preferred_element_type=jnp.float32)
    m_new = jnp.min(jnp.where(emb > 0, m4[..., None], float(n)),
                    axis=(1, 2))

    # newly active edges: exactly the mid-lines of each new tile (active at
    # side s, zeroed at side s/2: x % s == s/2 - 1 resp. y % s == s/2 - 1)
    half = s // 2
    def tiles_h(img):  # [H, tw_n] -> [T', s] in row-major tile order
        return img.reshape(th_n, s, tw_n).transpose(0, 2, 1).reshape(-1, s)

    def tiles_v(img):  # [th_n, W] -> [T', s]
        return img.reshape(th_n, tw_n, s).reshape(-1, s)

    a_e = jnp.concatenate([tiles_h(rank_img[:, half - 1::s]),
                           tiles_v(rank_img[half - 1::s, :])], axis=1)
    b_e = jnp.concatenate([tiles_h(rank_img[:, half::s]),
                           tiles_v(rank_img[half::s, :])], axis=1)
    w_e = jnp.concatenate([tiles_h(costs_f32[:, half - 1::s, 0]),
                           tiles_v(costs_f32[half - 1::s, :, 1])], axis=1)
    # frozen endpoints (-1) have all-zero one-hot rows; live endpoints of a
    # mid-line edge always sit in different quads, so a != b holds and the
    # diagonal stays zero
    we = w_e.astype(jnp.bfloat16)
    oh_aw = jax.nn.one_hot(a_e, slots, dtype=jnp.bfloat16) * we[..., None]
    oh_b = jax.nn.one_hot(b_e, slots, dtype=jnp.bfloat16)
    pair = jnp.einsum("tea,teb->tab", oh_aw, oh_b,
                      preferred_element_type=jnp.float32)
    sym_new = sym_new + pair + jnp.swapaxes(pair, 1, 2)
    return rank_img, sym_new, m_new, frozen, final_gid, overflow


def _apply_slot_map(rank_img: jnp.ndarray, cmap: jnp.ndarray, s: int,
                    slots: int) -> jnp.ndarray:
    """The one per-level pixel-space op of the matrix path: remap pixel
    ranks through the level's composed slot map (frozen stay frozen)."""
    height, width = rank_img.shape
    ranks_t = _to_tiles(rank_img, s)
    new_t = jnp.where(ranks_t < 0, -1,
                      _take_ranks(cmap, ranks_t, slots).astype(jnp.int32))
    return _from_tiles(new_t, height, width, s)


def _hier_gaec_matrix(costs_f32, sides, caps, rounds_per_level, mode,
                      start_level, init_state, leaf="auto") -> HierResult:
    """agg="matrix" driver; see hier_gaec for the contract."""
    height, width = costs_f32.shape[:2]
    n = height * width
    sentinel = float(n)

    fused_ok = (init_state is None and mode == "chain" and len(sides) >= 2
                and sides[0] == 8 and int(caps[0]) == 64
                and int(caps[1]) <= 256)
    if leaf == "fused" and not fused_ok:
        raise ValueError("leaf='fused' needs mode='chain', base 8, "
                         f"caps[0]=64 and >=2 levels; got sides={sides} "
                         f"caps={list(caps)[:2]} mode={mode}")
    if fused_ok and leaf in ("auto", "fused"):
        # levels 0-1 in one Pallas kernel (ops/multicut_leaf.py): identical
        # merge decisions with the one-hot operands kept in VMEM — the XLA
        # loop below continues from level 2 on the state it returns
        import jax as _jax

        from image_compression_tpu.ops.multicut_leaf import leaf_levels_fused

        (rank_img, ncand, frozen, final_gid, overflow, sym,
         m) = leaf_levels_fused(
            costs_f32, int(caps[1]), int(rounds_per_level[0]),
            int(rounds_per_level[1]),
            interpret=_jax.default_backend() == "cpu")
        for i in range(2, len(sides)):
            s, slots = sides[i], int(caps[i])
            (rank_img, sym, m, frozen, final_gid,
             overflow) = _matrix_transition(
                rank_img, ncand, sym, m, frozen, final_gid, overflow,
                costs_f32, sides[i - 1], int(caps[i - 1]), s, slots)
            sym, m, cmap, ncand = _matrix_rounds(
                sym, m, slots, int(rounds_per_level[i]), mode, 1000 * i,
                sentinel)
            rank_img = _apply_slot_map(rank_img, cmap, s, slots)
        return HierResult(rank_img, ncand, frozen, final_gid, overflow,
                          sides[-1], int(caps[-1]), minpix=m, pair=sym)

    if init_state is not None:
        if len(init_state) == 7:
            # native slot-space handoff (parallel/spatial.py with
            # agg="matrix"): the strips carried their pair matrices and
            # min-pixel vectors, so the continuation is bit-identical to an
            # unsharded matrix run — no pixel-space rebuild, no regrouping
            (rank_img, ncand, frozen, final_gid, overflow, sym,
             m) = init_state
        else:
            rank_img, ncand, frozen, final_gid, overflow = init_state
            prev = start_level - 1
            sym = _pair_from_pixels(rank_img, costs_f32, sides[prev],
                                    int(caps[prev]))
            m = _minpix_from_pixels(rank_img, sides[prev], int(caps[prev]))
        first = start_level
    else:
        overflow = jnp.int32(0)
        frozen = jnp.zeros((height, width), bool)
        final_gid = jnp.zeros((height, width), jnp.int32)
        s0, slots0 = sides[0], int(caps[0])
        ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
        rank_img = (ys % s0) * s0 + (xs % s0)
        sym = _pair_from_pixels(rank_img, costs_f32, s0, slots0)
        # level-0 ranks are the local pixel index: m is the pixel id itself
        m = _to_tiles(ys * width + xs, s0).astype(jnp.float32)
        sym, m, cmap, ncand = _matrix_rounds(
            sym, m, slots0, int(rounds_per_level[0]), mode, 0, sentinel)
        rank_img = _apply_slot_map(rank_img, cmap, s0, slots0)
        first = 1

    for i in range(first, len(sides)):
        s, slots = sides[i], int(caps[i])
        rank_img, sym, m, frozen, final_gid, overflow = _matrix_transition(
            rank_img, ncand, sym, m, frozen, final_gid, overflow,
            costs_f32, sides[i - 1], int(caps[i - 1]), s, slots)
        sym, m, cmap, ncand = _matrix_rounds(
            sym, m, slots, int(rounds_per_level[i]), mode, 1000 * i,
            sentinel)
        rank_img = _apply_slot_map(rank_img, cmap, s, slots)

    return HierResult(rank_img, ncand, frozen, final_gid, overflow,
                      sides[-1], int(caps[-1]), minpix=m, pair=sym)


def plan_levels(height: int, width: int, base: int = 8) -> list[int]:
    """Supertile sides for the hierarchy: base, 2*base, ... while they divide
    both dims. Empty if base does not divide the image."""
    if height % base or width % base or height < base or width < base:
        return []
    sides = []
    s = base
    while height % s == 0 and width % s == 0 and s <= min(height, width):
        sides.append(s)
        s *= 2
    return sides


def default_caps(sides: Sequence[int]) -> list[int]:
    """Slot caps per level. The first level is exact (s^2 singleton slots);
    later caps trade HBM traffic (one-hot matmuls scale with S) against
    freezing risk. Sized from measured region counts on noisy cost fields
    (benchmarks/profile_multicut.py: ~45 live regions per 16x16 tile on the
    worst bench workload, sublinear growth with tile area above that);
    tightening from [.., 512, 512, ..] to this ramp cut the 256px solve 30%
    at identical objective and zero freezes."""
    caps = []
    for i, s in enumerate(sides):
        if i == 0:
            caps.append(s * s)
        else:
            caps.append(int(min(4 * caps[-1], s * s, 64 + 64 * i)))
    return caps


def lean_caps(sides: Sequence[int], kind: str = "half") -> list[int]:
    """Tighter slot-cap schedules than `default_caps`, trading freeze risk
    for HBM traffic (the one-hot pair matmuls scale with S^2). Profiled on
    the bench workload (benchmarks/profile_hier.py): "half" cuts the hier
    solve ~35% at +0.002% objective, "flat64" ~46% at +0.006%; the cycle-
    packing certificate (multicut_upper_bound) still bounds the total gap."""
    base = default_caps(sides)
    if kind == "half":
        return [c if i == 0 else max(32, c // 2) for i, c in enumerate(base)]
    if kind == "flat64":
        return [c if i == 0 else min(c, 64) for i, c in enumerate(base)]
    raise ValueError(f"unknown caps kind: {kind}")


def hier_gaec(costs_hw2: jnp.ndarray, mode: str = "chain", base: int = 8,
              rounds_per_level: Sequence[int] | None = None,
              caps: Sequence[int] | None = None,
              start_level: int = 0,
              init_state: tuple | None = None,
              agg: str = "pixel", leaf: str = "auto") -> HierResult:
    """Run the dense hierarchy over all divisible levels.

    Returns per-pixel region ranks within the top-level supertile plus the
    static top-tile geometry so callers can globalize ids (see
    ops/multicut.py::multicut_grid, which finishes with sorted rounds only if
    the top tile is smaller than the image).

    start_level/init_state resume the hierarchy mid-way (the spatially
    sharded path, parallel/spatial.py: strips run levels that fit their
    height locally, then the gathered state continues here). init_state is
    (rank_img, ncand, frozen, final_gid, overflow) exactly as the loop
    carries them after finishing level start_level - 1; sides/caps/rounds
    must be the FULL image's plan so the resumed levels merge identically
    to an unsharded run. With agg="matrix" a 7-tuple
    (..., pair, minpix) hands the slot-space state over natively (the
    strips' carried pair matrices + min-pixel vectors in global pixel ids),
    skipping the pixel-space rebuild entirely — the resumed run is then
    bit-identical to an unsharded matrix run; the 5-tuple form rebuilds
    pair/minpix from pixel state instead.

    agg selects the pair-cost aggregation: "pixel" recomputes the dense
    pair matrix from pixel-space one-hot matmuls every round; "matrix"
    keeps the pair matrix as slot-space state (P <- M^T P M per round,
    child-matrix embedding + mid-line edges per level) — the same merge
    decisions at a fraction of the pixel-space work (bit-identical on
    integer-valued costs; f32-regrouping differences otherwise).

    leaf (agg="matrix" only) selects how levels 0-1 run: "auto" uses the
    fused Pallas kernel (ops/multicut_leaf.py) whenever applicable
    (mode="chain", base 8, fresh start), "fused" requires it, "xla" keeps
    the pure-XLA loop. Same merges either way (bit-identical on
    integer-valued costs; f32-regrouping differences on real costs).
    """
    height, width = costs_hw2.shape[:2]
    sides = plan_levels(height, width, base)
    if not sides:
        raise ValueError(f"image {height}x{width} not divisible by {base}")
    if (start_level > 0) != (init_state is not None):
        raise ValueError("start_level and init_state go together")
    if agg not in ("pixel", "matrix"):
        raise ValueError(f"unknown agg: {agg}")
    if leaf not in ("auto", "fused", "xla"):
        raise ValueError(f"unknown leaf: {leaf}")
    if caps is None:
        caps = default_caps(sides)
    if int(caps[0]) < sides[0] * sides[0]:
        raise ValueError("caps[0] must cover the base tile "
                         f"({sides[0]}^2), got {caps[0]}")
    if rounds_per_level is None:
        if mode == "chain":
            # tuned on both the smooth bench workload and noisy sampled-
            # policy costs: objectives within +-0.003% of [4,3,2,2,...]
            # (the ICM sweeps absorb the difference) at ~40% fewer rounds
            rounds_per_level = [3, 2] + [1] * (len(sides) - 2)
        else:
            # random_mate's coin-gated merges convert fewer candidates per
            # round; the lean schedule loses planted-partition recovery
            rounds_per_level = [4, 3] + [2] * (len(sides) - 2)
    elif len(rounds_per_level) < len(sides):  # pad short schedules: deeper
        rounds_per_level = (list(rounds_per_level)  # levels repeat the last
                            + [rounds_per_level[-1]]
                            * (len(sides) - len(rounds_per_level)))

    costs_f32 = costs_hw2.astype(jnp.float32)
    if agg == "matrix":
        return _hier_gaec_matrix(costs_f32, sides, caps, rounds_per_level,
                                 mode, start_level, init_state, leaf=leaf)
    n = height * width
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    if init_state is not None:
        rank_img, ncand, frozen, final_gid, overflow = init_state
    else:
        overflow = jnp.int32(0)
        frozen = jnp.zeros((height, width), bool)
        final_gid = jnp.zeros((height, width), jnp.int32)
        rank_img = None
        ncand = None
    for i, s in list(enumerate(sides))[start_level:]:
        slots = int(caps[i])
        if i == 0:
            rank_img = (ys % s) * s + (xs % s)
        else:
            # level transition: offset each subtile's dense ranks by the
            # number of live regions in the preceding subtiles (elementwise;
            # quad order (0,0), (0,1), (1,0), (1,1) within each new tile)
            prev_s = sides[i - 1]
            th_p, tw_p = height // prev_s, width // prev_s
            counts = ncand.reshape(th_p, tw_p)
            c00 = counts[0::2, 0::2]
            c01 = counts[0::2, 1::2]
            c10 = counts[1::2, 0::2]
            off = jnp.stack([
                jnp.stack([jnp.zeros_like(c00), c00], -1),
                jnp.stack([c00 + c01, c00 + c01 + c10], -1),
            ], -2)                                # [th', tw', qy, qx]
            off_prev = (off.transpose(0, 2, 1, 3)
                        .reshape(th_p, tw_p))     # per previous-level tile
            off_img = jnp.repeat(jnp.repeat(off_prev, prev_s, axis=0),
                                 prev_s, axis=1)
            cand_img = rank_img + off_img
            # freeze whole regions that don't fit the cap, labeling each by
            # its smallest pixel index (masked one-hot min over the previous
            # level's slots — the per-level form of smallest_pixel_labels),
            # so frozen regions satisfy the same minlabel contract as live
            # ones and are automatically disjoint from live labels
            newly = ~frozen & (rank_img >= 0) & (cand_img >= slots)
            prev_slots = int(caps[i - 1])
            ranks_pt = _to_tiles(rank_img, prev_s)
            pix_pt = _to_tiles(ys * width + xs, prev_s).astype(jnp.float32)
            # gating-only one-hot (oh > 0): bf16 is exact for 0/1
            oh_p = jax.nn.one_hot(ranks_pt, prev_slots, dtype=jnp.bfloat16)
            mins_p = jnp.min(jnp.where(oh_p > 0, pix_pt[..., None], float(n)),
                             axis=1)
            minpix_t = _take_slots(mins_p, jnp.maximum(ranks_pt, 0),
                                   prev_slots)
            minpix = _from_tiles(minpix_t, height, width,
                                 prev_s).astype(jnp.int32)
            final_gid = jnp.where(newly, minpix, final_gid)
            frozen = frozen | newly
            rank_img = jnp.where(frozen, -1, cand_img)
            # frozen regions counted once each (they occupy no slot)
            overflow = overflow + jnp.sum(
                jnp.maximum((c00 + c01 + c10 +
                             counts[1::2, 1::2]).reshape(-1) - slots, 0))

        w_e = _level_weights(costs_f32, s)
        rank_img, ncand = _dense_rounds(
            rank_img, w_e, s, slots, int(rounds_per_level[i]), mode,
            level_salt=1000 * i, identity_first=(i == 0))

    return HierResult(rank_img, ncand, frozen, final_gid, overflow,
                      sides[-1], int(caps[-1]))


def globalize(res: HierResult, height: int, width: int) -> jnp.ndarray:
    """Per-pixel region ids across the whole image from top-tile ranks:
    id = top_tile_index * top_slots + rank (< T*S <= H*W). Frozen pixels get
    the sentinel H*W — callers running further contraction must treat ids
    >= H*W as inactive and re-apply `res.final_gid` to frozen pixels after
    (ops/multicut.py does both)."""
    s, slots = res.top_tile, res.top_slots
    tw = width // s
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    tile_idx = (ys // s) * tw + (xs // s)
    return jnp.where(res.frozen, height * width,
                     tile_idx * slots + res.rank_img)


def smallest_pixel_labels(res: HierResult) -> jnp.ndarray:
    """Relabel top-tile ranks to each region's smallest pixel index — the
    public label contract — via a masked min over slot columns (pixel ids
    < 2^24 are exact in f32). Frozen regions carry their own smallest pixel
    index in final_gid (assigned at freeze time), so the returned labeling
    satisfies the minlabel contract for every region."""
    height, width = res.rank_img.shape
    s, slots = res.top_tile, res.top_slots
    if res.minpix is not None:  # agg="matrix": one slot lookup, no pixel min
        ranks_t = _to_tiles(res.rank_img, s)
        lab_t = _take_slots(res.minpix, jnp.maximum(ranks_t, 0),
                            slots).astype(jnp.int32)
        labels = _from_tiles(lab_t, height, width, s)
        return jnp.where(res.frozen, res.final_gid, labels)
    ranks_t = _to_tiles(res.rank_img, s)                    # [T, s*s]
    n = height * width
    # global pixel index of each (tile, local) position
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    pix_t = _to_tiles(ys * width + xs, s).astype(jnp.float32)
    # gating-only one-hot (oh > 0): bf16 is exact for 0/1
    oh = jax.nn.one_hot(ranks_t, slots, dtype=jnp.bfloat16)  # [T, P, S]
    masked = jnp.where(oh > 0, pix_t[..., None], float(n))
    mins = jnp.min(masked, axis=1)                          # [T, S]
    lab_t = _take_slots(mins, ranks_t, slots).astype(jnp.int32)
    labels = _from_tiles(lab_t, height, width, s)
    return jnp.where(res.frozen, res.final_gid, labels)
