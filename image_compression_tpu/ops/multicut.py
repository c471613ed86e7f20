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

NEG_INF = jnp.float32(-jnp.inf)


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


@functools.partial(jax.jit,
                   static_argnames=("max_rounds", "mode", "icm_sweeps",
                                    "contract_threshold", "return_rounds"))
def multicut_grid(costs_hw2: jnp.ndarray, max_rounds: int = 64,
                  mode: str = "random_mate", icm_sweeps: int = 8,
                  contract_threshold: float = 0.0,
                  return_rounds: bool = False) -> jnp.ndarray:
    """Solve multicut on the 4-connected grid.

    Greedy contraction (GAEC) followed by checkerboard single-pixel local
    moves (the TPU-friendly analogue of RAMA's improvement sweeps) and a
    connectivity-restoring relabel.

    Args:
      costs_hw2: [H, W, 2] float edge costs (padding slots ignored).
      max_rounds: static upper bound on contraction rounds.
      mode: parallel contraction scheme per round --
        "chain":       hook every region to its best attractive neighbor and
                       contract whole components (fastest, overshoots chains);
        "mutual":      mutual-best matching only (sequential-GAEC quality,
                       slow convergence);
        "random_mate": mutual pairs plus coin-flipped tail->head hooks
                       (chain-free, O(log n) expected rounds) -- default;
        "random_pair": like random_mate but heads accept only their best
                       tail, so every merge is an exact GAEC pair move.
      icm_sweeps: local-move refinement sweeps after contraction (0 = off).
      contract_threshold: only contract pairs whose aggregated cost is at
        least this fraction of the round's maximum pair cost (RAMA gates its
        parallel matchings the same way); 0 disables the gate.

    Returns:
      labels: [H, W] int32; cluster id = smallest pixel index in the cluster.
    """
    if mode not in ("chain", "mutual", "random_mate", "random_pair"):
        raise ValueError(f"unknown mode: {mode}")
    height, width = costs_hw2.shape[:2]
    n = height * width
    u_np, v_np = _grid_edge_endpoints(height, width)
    eu = jnp.asarray(u_np)
    ev = jnp.asarray(v_np)
    w = costs_hw2.reshape(-1).astype(jnp.float32)
    num_edges = w.shape[0]

    def round_body(state):
        root, _changed, it = state

        # --- 1. aggregate costs per adjacent region pair -------------------
        ru = root[eu]
        rv = root[ev]
        active = ru != rv
        a = jnp.where(active, jnp.minimum(ru, rv), n)   # canonical pair (a, b)
        b = jnp.where(active, jnp.maximum(ru, rv), n)
        we = jnp.where(active, w, 0.0)
        # lexicographic sort by (a, b); ties irrelevant for the sum
        a_s, b_s, w_s = jax.lax.sort((a, b, we), num_keys=2)
        is_start = jnp.concatenate([
            jnp.ones((1,), bool),
            (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]),
        ])
        pair_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        pair_cost = jax.ops.segment_sum(
            w_s, pair_id, num_segments=num_edges, indices_are_sorted=True)

        # distinct-pair table, one row per sorted run start
        pa = jnp.where(is_start & (a_s < n), a_s, n)
        pb = jnp.where(is_start & (a_s < n), b_s, n)
        pc = pair_cost[pair_id] * is_start  # cost at run starts only

        # --- 2. best attractive neighbor per region ------------------------
        # directed view: each distinct pair contributes (a->b) and (b->a)
        src = jnp.concatenate([pa, pb])
        dst = jnp.concatenate([pb, pa])
        val = jnp.concatenate([pc, pc])
        valid = src < n
        src_c = jnp.where(valid, src, 0)
        best = jax.ops.segment_max(
            jnp.where(valid, val, NEG_INF), src_c, num_segments=n)
        is_best = valid & (val == best[src_c])
        partner = jax.ops.segment_min(
            jnp.where(is_best, dst, n), src_c, num_segments=n)

        merge = (best > 0.0) & (partner < n)
        if contract_threshold > 0.0:
            gate = contract_threshold * jnp.max(pc)
            merge = merge & (best >= gate)
        ids = jnp.arange(n, dtype=partner.dtype)
        partner_safe = jnp.where(merge, partner, 0)
        mutual = merge & (jnp.take(partner, partner_safe) == ids)
        if mode == "mutual":
            merge = mutual
        elif mode in ("random_mate", "random_pair"):
            # random-mate chain breaking: coin per region; tails hook into
            # heads only. Mutual-best pairs always merge (safe regardless of
            # coins). Optionally heads accept only their own best tail
            # ("random_pair"), making every merge an exact GAEC pair move.
            coin = jax.random.bernoulli(
                jax.random.fold_in(jax.random.PRNGKey(0), it),
                0.5, (n,))
            tail_to_head = merge & ~coin & jnp.take(coin, partner_safe)
            if mode == "random_pair":
                # each head accepts only its best incoming tail -> matching
                hook_val = jnp.where(tail_to_head, best, NEG_INF)
                head_best = jax.ops.segment_max(
                    hook_val, partner_safe, num_segments=n)
                is_hb = tail_to_head & (best == head_best[partner_safe])
                chosen = jax.ops.segment_min(
                    jnp.where(is_hb, ids, n), partner_safe, num_segments=n)
                tail_to_head = is_hb & (chosen[partner_safe] == ids)
            merge = mutual | tail_to_head

        # --- 3. contract ----------------------------------------------------
        nxt = jnp.where(merge, partner, jnp.arange(n, dtype=partner.dtype))
        # break 2-cycles: smaller id becomes the root
        two_cycle = (nxt[nxt] == jnp.arange(n)) & (jnp.arange(n) < nxt)
        nxt = jnp.where(two_cycle, jnp.arange(n), nxt)
        # pointer doubling to roots (forest depth halves each step)
        for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
            nxt = nxt[nxt]
        new_root = nxt[root]
        changed = jnp.any(new_root != root)
        return new_root, changed, it + 1

    def cond(state):
        _root, changed, it = state
        return changed & (it < max_rounds)

    root0 = jnp.arange(n, dtype=jnp.int32)
    root, _, rounds = jax.lax.while_loop(
        cond, round_body, (root0, jnp.asarray(True), jnp.asarray(0)))
    labels = root.reshape(height, width)
    if icm_sweeps > 0:
        labels = _icm_refine(labels, costs_hw2.astype(jnp.float32), icm_sweeps)
        labels = relabel_connected(labels)
    if return_rounds:
        return labels, rounds
    return labels


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


@jax.jit
def relabel_connected(labels: jnp.ndarray) -> jnp.ndarray:
    """Split any disconnected cluster into its connected components and
    relabel every cluster by its smallest pixel index.

    Objective-neutral for multicut (no joined edges exist between the parts
    of a disconnected cluster) and restores RAMA's connected-cluster
    guarantee after local moves. Hooking + pointer-doubling connected
    components over same-label grid edges.
    """
    height, width = labels.shape
    n = height * width
    u_np, v_np = _grid_edge_endpoints(height, width)
    eu = jnp.asarray(u_np)
    ev = jnp.asarray(v_np)
    flat = labels.reshape(-1)
    same = (flat[eu] == flat[ev]) & (eu != ev)

    def body(state):
        parent, _changed = state
        pu = parent[eu]
        pv = parent[ev]
        lo = jnp.where(same, jnp.minimum(pu, pv), n)
        parent2 = parent
        parent2 = parent2.at[eu].min(jnp.where(same, lo, n).astype(parent.dtype))
        parent2 = parent2.at[ev].min(jnp.where(same, lo, n).astype(parent.dtype))
        for _ in range(4):
            parent2 = parent2[parent2]
        changed = jnp.any(parent2 != parent)
        return parent2, changed

    parent0 = jnp.arange(n, dtype=jnp.int32)
    parent, _ = jax.lax.while_loop(
        lambda s: s[1], body, (parent0, jnp.asarray(True)))
    return parent.reshape(height, width)


@functools.partial(jax.jit,
                   static_argnames=("max_rounds", "mode", "icm_sweeps"))
def multicut_grid_batched(costs_bhw2: jnp.ndarray, max_rounds: int = 64,
                          mode: str = "random_mate",
                          icm_sweeps: int = 8) -> jnp.ndarray:
    """Batched multicut [B, H, W, 2] -> [B, H, W] int32 (true parallelism over
    the batch, unlike rama_wrapper.cu:102-124's sequential loop)."""
    fn = functools.partial(multicut_grid, max_rounds=max_rounds, mode=mode,
                           icm_sweeps=icm_sweeps)
    return jax.vmap(fn)(costs_bhw2)


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
