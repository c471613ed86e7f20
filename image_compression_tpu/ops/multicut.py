"""Grid multicut solver: TPU-native replacement for the RAMA GPU solver.

The reference bridges libtorch to the external RAMA CUDA solver
(rama_wrapper.cu:52-127; solver described in arXiv:2109.01838), which runs
greedy additive edge contraction (GAEC): repeatedly contract the most
attractive inter-region edges and re-accumulate costs between the merged
regions. Its batched API degenerates to a sequential per-sample loop
(rama_wrapper.cu:102-124).

This module re-creates that scheme as a fully static-shaped XLA program,
vmappable over the batch (true batched multicut — fixing the reference's
throughput sin):

  repeat until no attractive region pair:
    1. aggregate costs per adjacent region pair  (sort + segmented sum; the
       number of *distinct adjacent region pairs* is bounded by the number of
       pixel-grid edges E, so shapes stay static)
    2. each region hooks to its most attractive neighbor (Boruvka-style), or
       mutual-best matching in conservative mode
    3. contract: break 2-cycles, pointer-jump to roots, relabel pixels

Clusters are unions of grid-adjacent merges, hence always connected, matching
RAMA's contraction semantics. Edge-cost convention: positive = attraction
("connect"), negative = repulsion ("cut").

Inputs are edge-cost planes [H, W, 2] (see ops/edges.py); no COO index lists
are ever materialized on device — the grid topology of
build_rama_indices (training.cpp:36-66) stays implicit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.multicut_hier import (
    globalize, hier_gaec, lean_caps, plan_levels, smallest_pixel_labels)
from image_compression_tpu.ops.multicut_tiles import (
    boundary_edges, tile_presolve)

NEG_INF = -jnp.inf


def _grid_edge_endpoints(height: int, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Static (u, v) pixel indices for every edge plane slot [H*W*2].

    Slot order is (y, x, plane): plane 0 connects (y,x)-(y,x+1), plane 1
    connects (y,x)-(y+1,x). Padding slots (last column of plane 0, last row of
    plane 1) are given u == v so they are never active.
    """
    ys, xs = np.mgrid[0:height, 0:width]
    base = (ys * width + xs).astype(np.int32)
    u = np.stack([base, base], axis=-1)
    v_h = np.where(xs + 1 < width, base + 1, base)
    v_v = np.where(ys + 1 < height, base + width, base)
    v = np.stack([v_h, v_v], axis=-1).astype(np.int32)
    return u.reshape(-1), v.reshape(-1)


def _contract_rounds(root0, endpoints_fn, w, n, *, max_rounds, mode,
                     matchings_per_round, salt_base):
    """Sorted GAEC rounds over an arbitrary static edge list.

    Each round pays for ONE sorted cost re-aggregation over the edge list and
    runs `matchings_per_round` matching+contraction passes against that pair
    table; a pass may only merge regions still untouched this round, so every
    accepted merge uses its exact aggregated cost (the same amortization RAMA
    uses between cost recomputations).

    endpoints_fn(root) -> (ru, rv): region ids of each edge's endpoints.
    Callers provide plane-shift implementations where possible — gathers with
    single-element rows are serialized on TPU and dominated the runtime.

    Returns (root, rounds_used).
    """
    num_edges = w.shape[0]
    ids = jnp.arange(n, dtype=jnp.int32)
    log_n = int(np.ceil(np.log2(max(n, 2)))) + 1

    def match_and_contract(m, touched, pa, pb, pc, chain: bool, salt,
                           first_pass: bool = False, last_pass: bool = False):
        if first_pass:
            # touched is all-False on the first pass: skip its gathers
            act = (pa < n) & (pb < n)
        else:
            pa_c = jnp.minimum(pa, n - 1)
            pb_c = jnp.minimum(pb, n - 1)
            act = (pa < n) & (pb < n) & ~touched[pa_c] & ~touched[pb_c]

        src = jnp.concatenate([jnp.where(act, pa, n), jnp.where(act, pb, n)])
        dst = jnp.concatenate([jnp.where(act, pb, n), jnp.where(act, pa, n)])
        val = jnp.concatenate([pc, pc])
        valid = src < n
        src_c = jnp.where(valid, src, 0)
        best = jax.ops.segment_max(
            jnp.where(valid, val, NEG_INF), src_c, num_segments=n)
        is_best = valid & (val == best[src_c])
        partner = jax.ops.segment_min(
            jnp.where(is_best, dst, n), src_c, num_segments=n)

        merge = (best > 0.0) & (partner < n)
        partner_safe = jnp.where(merge, partner, 0)
        mutual = merge & (jnp.take(partner, partner_safe) == ids)
        if chain:
            pass  # hook everything (Boruvka-style)
        else:
            # random-mate: mutual pairs always; tails hook into heads only
            coin = jax.random.bernoulli(
                jax.random.fold_in(jax.random.PRNGKey(0), salt), 0.5, (n,))
            tail_to_head = merge & ~coin & jnp.take(coin, partner_safe)
            merge = mutual | tail_to_head
        if mode == "mutual":
            merge = mutual

        nxt = jnp.where(merge, partner, ids)
        two_cycle = (nxt[nxt] == ids) & (ids < nxt)
        nxt = jnp.where(two_cycle, ids, nxt)
        # matching modes build stars (depth <= 4 -> 2 doublings). Chain mode
        # can build deep trees, but single-element-row gathers are serialized
        # on TPU, so cap at 2 doublings (depth 4): deeper chains simply
        # finish contracting in the next outer round (still consistent — the
        # intermediate ids keep acting as region ids; measured objective is
        # unchanged).
        for _ in range(2):
            nxt = nxt[nxt]
        if last_pass:
            return nxt[m], touched
        # a region is touched if it merged away or something merged into it
        received = jnp.zeros((n,), bool).at[partner_safe].max(merge)
        touched = touched | merge | received
        return nxt[m], touched

    def mate_passes(m, touched, pa, pb, pc, it):
        for k in range(matchings_per_round):
            m, touched = match_and_contract(
                m, touched, pa, pb, pc, False,
                salt_base + it * matchings_per_round + k,
                first_pass=(k == 0),
                last_pass=(k == matchings_per_round - 1))
        return m

    def round_body(state):
        root, _changed, it = state

        # --- 1. aggregate costs per adjacent region pair -------------------
        ru, rv = endpoints_fn(root)
        active = ru != rv
        a = jnp.where(active, jnp.minimum(ru, rv), n)   # canonical pair (a, b)
        b = jnp.where(active, jnp.maximum(ru, rv), n)
        we = jnp.where(active, w, 0.0)
        if n <= (1 << 16):
            # pack the pair into one sortable uint32 key (a < b < n, so
            # a*n+b < n^2 <= 2^32): one-key sorts are markedly cheaper than
            # lexicographic two-key sorts on TPU. Sentinel = uint32 max,
            # which decodes to a >= b and is filtered below.
            key = jnp.where(active,
                            a.astype(jnp.uint32) * jnp.uint32(n)
                            + b.astype(jnp.uint32),
                            jnp.uint32(0xFFFFFFFF))
            key_s, w_s = jax.lax.sort((key, we), num_keys=1)
            a_s = (key_s // jnp.uint32(n)).astype(jnp.int32)
            b_s = (key_s % jnp.uint32(n)).astype(jnp.int32)
        else:
            # lexicographic sort by (a, b); ties irrelevant for the sum
            a_s, b_s, w_s = jax.lax.sort((a, b, we), num_keys=2)
        is_start = jnp.concatenate([
            jnp.ones((1,), bool),
            (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]),
        ])
        # per-pair totals via segmented scans on the sorted runs (pure scans
        # beat scatter-based segment_sum + gather on TPU): forward segmented
        # cumsum, then a reverse segmented hold-scan propagates each run's
        # total (its cumsum value at the run end) back to the run start.
        def seg_combine(op):
            def combine(x, y):
                (vx, _rx), (vy, ry) = x, y
                return jnp.where(ry, vy, op(vx, vy)), x[1] | ry
            return combine

        fwd, _ = jax.lax.associative_scan(
            seg_combine(jnp.add), (w_s, is_start))
        is_end = jnp.concatenate([is_start[1:], jnp.ones((1,), bool)])
        # hold = left projection: every element adopts its (flipped-order)
        # run start's value, i.e. the original run end's cumsum = run total
        tot, _ = jax.lax.associative_scan(
            seg_combine(lambda vx, _vy: vx), (fwd, is_end), reverse=True)

        # distinct-pair table, one row per sorted run start (real pairs have
        # a < b; sentinels decode to a >= b)
        run_ok = is_start & (a_s < b_s) & (b_s < n)
        pa = jnp.where(run_ok, a_s, n)
        pb = jnp.where(run_ok, b_s, n)
        pc = jnp.where(run_ok, tot, 0.0)

        # --- 2+3. matching passes against this table -----------------------
        m = ids
        touched = jnp.zeros((n,), bool)
        if mode == "chain":
            m, _ = match_and_contract(m, touched, pa, pb, pc, True,
                                      salt_base + it, first_pass=True,
                                      last_pass=True)
        elif mode == "hybrid":
            m = jax.lax.cond(
                it == 0,
                lambda m: match_and_contract(m, touched, pa, pb, pc,
                                             True, salt_base + it,
                                             first_pass=True,
                                             last_pass=True)[0],
                lambda m: mate_passes(m, touched, pa, pb, pc, it),
                m)
        else:
            m = mate_passes(m, touched, pa, pb, pc, it)

        new_root = m[root]
        changed = jnp.any(new_root != root)
        return new_root, changed, it + 1

    def cond(state):
        _root, changed, it = state
        return changed & (it < max_rounds)

    root, _, rounds = jax.lax.while_loop(
        cond, round_body, (root0, jnp.asarray(True), jnp.asarray(0)))
    return root, rounds


@functools.partial(jax.jit,
                   static_argnames=("max_rounds", "mode", "icm_sweeps",
                                    "matchings_per_round", "tile",
                                    "presolve_rounds", "boundary_rounds",
                                    "return_rounds", "hier",
                                    "hier_rounds", "hier_caps",
                                    "hier_agg", "hier_leaf"))
def multicut_grid(costs_hw2: jnp.ndarray, max_rounds: int = 3,
                  mode: str = "chain", icm_sweeps: int = 8,
                  matchings_per_round: int = 4, tile: int = 16,
                  presolve_rounds: int = 4, boundary_rounds: int = 4,
                  return_rounds: bool = False,
                  hier: bool = True,
                  hier_rounds: tuple[int, ...] | None = None,
                  hier_caps: tuple[int, ...] | str | None = None,
                  hier_agg: str = "pixel",
                  hier_leaf: str = "auto") -> jnp.ndarray:
    """Solve multicut on the 4-connected grid.

    Multilevel greedy additive edge contraction (GAEC), the TPU mapping of
    RAMA's scheme, followed by checkerboard single-pixel local moves (the
    analogue of RAMA's improvement sweeps) and a connectivity-restoring
    relabel:

      1. dense tile presolve: exact intra-tile GAEC with per-tile pair-cost
         matrices on the MXU (ops/multicut_tiles.py) — no sorts;
      2. boundary rounds: sorted GAEC over only the tile-crossing edges
         (a small static edge list), merging regions across tiles;
      3. full rounds: sorted GAEC over all edges with exact aggregation —
         the final word on every remaining merge.

    Args:
      costs_hw2: [H, W, 2] float edge costs (padding slots ignored).
      max_rounds: static bound on full-edge-list rounds (phase 3).
      mode: contraction scheme per matching pass --
        "chain":       hook every region to its best attractive neighbor and
                       contract whole components -- default: fastest
                       convergence; its occasional chain overshoot is
                       repaired by the ICM sweeps (measured objective within
                       0.1% of random_mate on realistic cost fields);
        "mutual":      mutual-best matching only;
        "random_mate": mutual pairs plus coin-flipped tail->head hooks
                       (chain-free, exact-cost merges only);
        "hybrid":      chain for the first round of each phase, then
                       random_mate.
      icm_sweeps: local-move refinement sweeps after contraction (0 = off).
        With 0 sweeps the connectivity-restoring relabel is also skipped:
        GAEC merges only along graph edges, so its clusters are connected by
        construction — only ICM's single-pixel moves can disconnect one.
      matchings_per_round: matching passes per cost re-aggregation.
      tile: presolve tile size (0 disables; must divide H and W).
      presolve_rounds / boundary_rounds: static bounds for phases 1 / 2.
      hier_rounds / hier_caps: per-level round counts and slot caps for the
        dense hierarchy (hier_caps may be a `lean_caps` preset name); None
        uses the tuned defaults in ops/multicut_hier.py.
      hier_agg: "pixel" re-aggregates pair costs from pixel-space one-hot
        matmuls every round; "matrix" carries the pair matrix as slot-space
        state (same merges, a fraction of the work — ops/multicut_hier.py).
      hier_leaf: "auto" | "fused" | "xla" — whether the matrix agg runs
        hierarchy levels 0-1 in the fused Pallas kernel
        (ops/multicut_leaf.py; same merges, VMEM-resident operands).

    Returns:
      labels: [H, W] int32; cluster id = smallest pixel index in the cluster.
    """
    if mode not in ("chain", "mutual", "random_mate", "hybrid"):
        raise ValueError(f"unknown mode: {mode}")
    height, width = costs_hw2.shape[:2]
    n = height * width
    costs_f32 = costs_hw2.astype(jnp.float32)
    w_all = costs_f32.reshape(-1)

    # --- tiny-grid ensemble ------------------------------------------------
    # Grids too small for the dense hierarchy fall through to the sorted
    # path, where chain hooking's overshoot is worst on adversarial tiny
    # instances. At this size a second solve is nearly free: run random_mate
    # too and keep the better objective (cuts the summed brute-force gap
    # ~2x, tests/test_multicut.py::test_near_optimal_vs_brute_force).
    if (hier and mode == "chain" and not return_rounds
            and min(height, width) < 16):
        kw = dict(max_rounds=max_rounds, icm_sweeps=icm_sweeps,
                  matchings_per_round=matchings_per_round, tile=tile,
                  presolve_rounds=presolve_rounds,
                  boundary_rounds=boundary_rounds, hier=False)
        lab_c = multicut_grid(costs_f32, mode="chain", **kw)
        lab_r = multicut_grid(costs_f32, mode="random_mate", **kw)

        def joined(lab):
            h_sum = jnp.sum(jnp.where(lab[:, 1:] == lab[:, :-1],
                                      costs_f32[:, :-1, 0], 0.0))
            v_sum = jnp.sum(jnp.where(lab[1:, :] == lab[:-1, :],
                                      costs_f32[:-1, :, 1], 0.0))
            return h_sum + v_sum

        return jnp.where(joined(lab_c) >= joined(lab_r), lab_c, lab_r)

    # --- sort-free hierarchical dense path (ops/multicut_hier.py) ----------
    # Used whenever the grid admits at least two doubling levels; the sorted
    # machinery below remains for tiny shapes and as the finishing stage
    # when the top supertile is smaller than the image (H != W cases).
    # "mutual" and "hybrid" stay on the sorted path: mutual-only matching
    # converges too slowly per level, overflowing the dense slot caps.
    # Non-divisible images pad up to multiples of 32 with zero-cost edges
    # (padding pixels stay singletons and are cropped away) instead of
    # falling back to the ~10x-slower sorted path; 32 guarantees the padded
    # grid admits the 8->16->32 hierarchy levels.
    if (hier and mode in ("chain", "random_mate")
            and len(plan_levels(height, width, 8)) < 2
            and min(height, width) >= 16):
        from image_compression_tpu.ops.edges import edge_validity_masks

        ph, pw = -(-height // 32) * 32, -(-width // 32) * 32
        # the original's padding slots (last column/row) become real edges
        # to padded pixels: zero them before padding. Padding-to-padding
        # edges get a positive weight so the padding collapses into ONE
        # region per supertile (a single rank slot) instead of hundreds of
        # singletons crowding out real regions from the hierarchy's slot
        # caps; real-to-padding edges stay 0 (never merged).
        masked = costs_f32 * edge_validity_masks(height, width)
        ys_p = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 0)
        xs_p = jax.lax.broadcasted_iota(jnp.int32, (ph, pw), 1)
        pad_pad = ((ys_p >= height) | (xs_p >= width)).astype(jnp.float32)
        padded = (pad_pad[..., None]
                  + jnp.pad(masked,
                            ((0, ph - height), (0, pw - width), (0, 0))))
        out = multicut_grid(padded, max_rounds=max_rounds, mode=mode,
                            icm_sweeps=icm_sweeps,
                            matchings_per_round=matchings_per_round,
                            tile=tile, presolve_rounds=presolve_rounds,
                            boundary_rounds=boundary_rounds,
                            return_rounds=return_rounds, hier=True,
                            hier_rounds=hier_rounds, hier_caps=hier_caps,
                            hier_agg=hier_agg, hier_leaf=hier_leaf)
        if return_rounds:
            labels_p, rounds = out
        else:
            labels_p, rounds = out, None
        # labels reference padded pixel indices: restore the smallest-pixel-
        # index contract in original coordinates
        labels = relabel_connected(labels_p[:height, :width])
        return (labels, rounds) if return_rounds else labels

    hier_sides = plan_levels(height, width, 8) if hier else []
    if len(hier_sides) >= 2 and mode in ("chain", "random_mate"):
        caps = (lean_caps(hier_sides, hier_caps)
                if isinstance(hier_caps, str) else hier_caps)
        res = hier_gaec(costs_f32, mode=mode, rounds_per_level=hier_rounds,
                        caps=caps, agg=hier_agg, leaf=hier_leaf)
        labels = smallest_pixel_labels(res)
        rounds = jnp.asarray(0)
        if res.top_tile != height or res.top_tile != width:
            # non-square remainder: finish with sorted global rounds over the
            # remaining inter-supertile merges. relabel_connected re-roots
            # every region (frozen included — they carry smallest-pixel ids
            # already) so the sorted rounds see plain pixel-index roots;
            # former frozen regions simply rejoin contraction here — the
            # sorted rounds have no slot caps.
            root = relabel_connected(labels).reshape(-1)

            def grid_endpoints_h(r):
                img = r.reshape(height, width)
                right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
                down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
                return (jnp.stack([img, img], -1).reshape(-1),
                        jnp.stack([right, down], -1).reshape(-1))

            root, rounds = _contract_rounds(
                root, grid_endpoints_h, w_all, n,
                max_rounds=max(max_rounds, 1), mode=mode,
                matchings_per_round=matchings_per_round, salt_base=90_000)
            labels = root.reshape(height, width)
            if icm_sweeps == 0:
                # sorted-round roots are not smallest-pixel ids; restore the
                # minlabel contract here since no post-ICM relabel will
                labels = relabel_connected(labels)
        if icm_sweeps > 0:
            labels = _icm_refine(labels, costs_f32, icm_sweeps)
            labels = relabel_connected(labels)
        if return_rounds:
            return labels, rounds
        return labels

    use_presolve = (tile > 1 and height % tile == 0 and width % tile == 0
                    and height > tile and width > tile and presolve_rounds > 0)
    if use_presolve:
        root = tile_presolve(costs_f32, tile, presolve_rounds).reshape(-1)
        if boundary_rounds > 0:
            bu, bv, bslot = boundary_edges(height, width, tile)
            bu_j = jnp.asarray(bu)
            bv_j = jnp.asarray(bv)
            root, _ = _contract_rounds(
                root, lambda r: (r[bu_j], r[bv_j]), w_all[jnp.asarray(bslot)],
                n, max_rounds=boundary_rounds, mode=mode,
                matchings_per_round=matchings_per_round, salt_base=50_000)
    else:
        root = jnp.arange(n, dtype=jnp.int32)

    def grid_endpoints(r):
        """Endpoint region ids for the full plane-ordered edge list via
        shifts (no gathers). Slot order matches _grid_edge_endpoints:
        (y, x, plane); padding slots resolve to ru == rv."""
        img = r.reshape(height, width)
        right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
        ru = jnp.stack([img, img], axis=-1).reshape(-1)
        rv = jnp.stack([right, down], axis=-1).reshape(-1)
        return ru, rv

    root, rounds = _contract_rounds(
        root, grid_endpoints, w_all, n,
        max_rounds=max_rounds, mode=mode,
        matchings_per_round=matchings_per_round, salt_base=0)

    labels = root.reshape(height, width)
    if icm_sweeps > 0:
        labels = _icm_refine(labels, costs_f32, icm_sweeps)
        labels = relabel_connected(labels)
    if return_rounds:
        return labels, rounds
    return labels


def produces_minlabel(height: int, width: int, mode: str,
                      icm_sweeps: int, hier: bool = True) -> bool:
    """True when multicut_grid's labels are guaranteed to satisfy the
    smallest-pixel-index (minlabel) contract for these settings and shape,
    enabling the sort-free segment-stats path (ops/segment_stats.py).

    icm_sweeps > 0 always qualifies (the post-ICM relabel_connected
    re-roots every region). With icm_sweeps == 0 the hierarchy's labeling
    itself is minlabel (frozen regions included, ops/multicut_hier.py), the
    padded and non-square finishing paths relabel explicitly, and the grid
    reaches one of those whenever min(H, W) >= 16; only the tiny-grid
    sorted fallback leaves roots unnormalized."""
    if icm_sweeps > 0:
        return True
    return hier and mode in ("chain", "random_mate") \
        and min(height, width) >= 16


def _icm_refine(labels: jnp.ndarray, costs: jnp.ndarray,
                sweeps: int) -> jnp.ndarray:
    """Checkerboard iterated-conditional-modes refinement.

    Each pixel evaluates adopting one of its 4 neighbors' labels; the move
    gain is local because, under a checkerboard schedule, all of a moving
    pixel's neighbors are frozen within a half-sweep. Improves the GAEC
    solution toward the optimum the way RAMA's dual sweeps do, with only
    elementwise ops.
    """
    height, width = labels.shape
    w_h = costs[..., 0].at[:, width - 1].set(0.0)  # weight to right neighbor
    w_v = costs[..., 1].at[height - 1, :].set(0.0)  # weight to down neighbor

    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    parity = (ys + xs) % 2

    def neighbor_views(lab):
        big = jnp.pad(lab, 1, constant_values=-1)
        return (big[1:-1, 2:], big[1:-1, :-2],  # right, left
                big[2:, 1:-1], big[:-2, 1:-1])  # down, up

    w_left = jnp.pad(w_h, ((0, 0), (1, 0)))[:, :-1]
    w_up = jnp.pad(w_v, ((1, 0), (0, 0)))[:-1, :]

    def half_sweep(lab, active_parity):
        nb = neighbor_views(lab)
        weights = (w_h, w_left, w_v, w_up)

        def attachment(candidate):
            # sum of w(p, q) over neighbors q currently labeled `candidate`
            acc = jnp.zeros_like(w_h)
            for q_lab, w_pq in zip(nb, weights):
                acc = acc + jnp.where(q_lab == candidate, w_pq, 0.0)
            return acc

        stay = attachment(lab)
        best_gain = jnp.full_like(stay, 0.0)
        best_lab = lab
        for cand in nb:
            gain = jnp.where(cand >= 0, attachment(cand) - stay, -jnp.inf)
            take = gain > best_gain
            best_gain = jnp.where(take, gain, best_gain)
            best_lab = jnp.where(take, cand, best_lab)
        move = (parity == active_parity) & (best_gain > 1e-6)
        return jnp.where(move, best_lab, lab)

    def body(_, lab):
        lab = half_sweep(lab, 0)
        lab = half_sweep(lab, 1)
        return lab

    return jax.lax.fori_loop(0, sweeps, body, labels)


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def relabel_connected(labels: jnp.ndarray, max_rounds: int = 64) -> jnp.ndarray:
    """Split any disconnected cluster into its connected components and
    relabel every cluster by its smallest pixel index.

    Objective-neutral for multicut (no joined edges exist between the parts
    of a disconnected cluster) and restores RAMA's connected-cluster
    guarantee after local moves.

    Grid-native algorithm: segmented min-scans sweep the root ids along rows
    and columns (label boundaries reset the scan), iterated to a fixpoint —
    pure scans/elementwise ops instead of scatter-based hooking (which was
    the single most expensive op in the original pipeline). Convergence in a
    few sweeps for real segment shapes; deliberately capped at max_rounds
    (non-converged spiral components would merely stay split, which is
    objective-neutral and round-trip safe).
    """
    height, width = labels.shape

    def seg_min_scan(root, reset, axis, reverse):
        def combine(a, b):
            va, _ra = a
            vb, rb = b
            return jnp.where(rb, vb, jnp.minimum(va, vb)), a[1] | rb

        out, _ = jax.lax.associative_scan(
            combine, (root, reset), axis=axis, reverse=reverse)
        return out

    same_row = jnp.pad(labels[:, 1:] == labels[:, :-1], ((0, 0), (1, 0)))
    same_col = jnp.pad(labels[1:, :] == labels[:-1, :], ((1, 0), (0, 0)))

    def body(state):
        root, _changed = state
        r = root
        r = seg_min_scan(r, ~same_row, axis=1, reverse=False)
        r = seg_min_scan(r, ~jnp.roll(same_row, -1, axis=1)
                         .at[:, -1].set(False), axis=1, reverse=True)
        r = seg_min_scan(r, ~same_col, axis=0, reverse=False)
        r = seg_min_scan(r, ~jnp.roll(same_col, -1, axis=0)
                         .at[-1, :].set(False), axis=0, reverse=True)
        return r, jnp.any(r != root)

    n = height * width
    root0 = jnp.arange(n, dtype=jnp.int32).reshape(height, width)
    state = (root0, jnp.asarray(True))
    it = jnp.asarray(0)

    def cond(s):
        (_, changed), i = s
        return changed & (i < max_rounds)

    def step(s):
        (r, _), i = s
        return body((r, True)), i + 1

    (root, _), _ = jax.lax.while_loop(cond, step, (state, it))
    return root


@functools.partial(jax.jit,
                   static_argnames=("max_rounds", "mode", "icm_sweeps"))
def multicut_grid_batched(costs_bhw2: jnp.ndarray, max_rounds: int = 3,
                          mode: str = "chain",
                          icm_sweeps: int = 8) -> jnp.ndarray:
    """Batched multicut [B, H, W, 2] -> [B, H, W] int32 (true parallelism over
    the batch, unlike rama_wrapper.cu:102-124's sequential loop)."""
    fn = functools.partial(multicut_grid, max_rounds=max_rounds, mode=mode,
                           icm_sweeps=icm_sweeps)
    return jax.vmap(fn)(costs_bhw2)


@jax.jit
def multicut_upper_bound(costs_hw2: jnp.ndarray) -> jnp.ndarray:
    """Cycle-packing dual bound: a certified UPPER bound on the joined-edge
    objective (the maximization twin of the lower bound RAMA's dual phase
    reports, rama_wrapper.cu:26-44; conflicted-cycle packing per
    arXiv:2109.01838).

    The trivial bound joins every attractive edge: UB0 = sum of positive
    costs. Every grid unit square whose 4-cycle has EXACTLY ONE repulsive
    edge is conflicted: a partition either cuts some attractive edge of the
    cycle (losing >= its weight) or joins all three, which connects the
    repulsive edge's endpoints and pays its magnitude — any partition loses
    at least min(smallest positive in cycle, |negative|). Losses of
    edge-disjoint squares add, so subtracting the best of the four parity
    packings (squares at fixed (y%2, x%2) share no edges) keeps the bound
    valid. The solver's gap certificate is
    (multicut_upper_bound - multicut_objective) / |objective|.
    """
    height, width = costs_hw2.shape[:2]
    costs = costs_hw2.astype(jnp.float32)
    wh = costs[:, : width - 1, 0]          # [H, W-1] horizontal edges
    wv = costs[: height - 1, :, 1]         # [H-1, W] vertical edges
    ub0 = jnp.sum(jnp.maximum(wh, 0.0)) + jnp.sum(jnp.maximum(wv, 0.0))

    # unit square (y, x), y < H-1, x < W-1: top/bottom horizontal,
    # left/right vertical
    e = jnp.stack([wh[: height - 1, :], wh[1:, :],
                   wv[:, : width - 1], wv[:, 1:]], axis=-1)  # [H-1, W-1, 4]
    neg = e < 0.0
    conflicted = jnp.sum(neg, axis=-1) == 1
    min_pos = jnp.min(jnp.where(neg, jnp.inf, e), axis=-1)
    neg_mag = -jnp.sum(jnp.minimum(e, 0.0), axis=-1)
    loss = jnp.where(conflicted, jnp.minimum(min_pos, neg_mag), 0.0)

    ys = jax.lax.broadcasted_iota(jnp.int32, loss.shape, 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, loss.shape, 1)
    packs = jnp.stack([
        jnp.sum(jnp.where((ys % 2 == py) & (xs % 2 == px), loss, 0.0))
        for py in (0, 1) for px in (0, 1)])
    return ub0 - jnp.max(packs)


def multicut_objective(costs_hw2: np.ndarray, labels_hw: np.ndarray) -> float:
    """Sum of costs of *joined* edges (GAEC maximizes this). Host-side helper
    for tests/benchmarks."""
    costs = np.asarray(costs_hw2)
    labels = np.asarray(labels_hw)
    same_h = labels[:, :-1] == labels[:, 1:]
    same_v = labels[:-1, :] == labels[1:, :]
    return float((costs[:, :-1, 0] * same_h).sum() +
                 (costs[:-1, :, 1] * same_v).sum())


def brute_force_multicut(costs_hw2: np.ndarray) -> tuple[np.ndarray, float]:
    """Exact optimum by enumerating all partitions (tiny grids only).

    Test oracle (SURVEY.md section 4(e)). Enumerates set partitions via
    restricted-growth strings; feasible for H*W <= 9.
    """
    costs = np.asarray(costs_hw2)
    height, width = costs.shape[:2]
    n = height * width
    if n > 10:
        raise ValueError("brute force limited to <= 10 nodes")

    edges = []
    for y in range(height):
        for x in range(width):
            if x + 1 < width:
                edges.append((y * width + x, y * width + x + 1,
                              float(costs[y, x, 0])))
            if y + 1 < height:
                edges.append((y * width + x, (y + 1) * width + x,
                              float(costs[y, x, 1])))

    best_obj = -np.inf
    best_assign = None

    def rec(i, assign, k):
        nonlocal best_obj, best_assign
        if i == n:
            obj = sum(w for (uu, vv, w) in edges if assign[uu] == assign[vv])
            if obj > best_obj:
                best_obj = obj
                best_assign = assign.copy()
            return
        for c in range(k + 1):
            assign[i] = c
            rec(i + 1, assign, max(k, c + 1))

    rec(0, [0] * n, 0)
    return np.asarray(best_assign).reshape(height, width), best_obj
