"""Multicut solver: trivial-cost invariants, exact recovery of planted
partitions, near-optimality vs brute force on tiny grids, batching
(SURVEY.md section 4(e))."""

import jax.numpy as jnp
import numpy as np
import pytest

from image_compression_tpu.ops.multicut import (
    brute_force_multicut, multicut_grid, multicut_grid_batched,
    multicut_objective)
from image_compression_tpu.utils.random_partition import (
    partition_to_edge_signs, random_rect_partition)


def n_clusters(labels):
    return len(np.unique(np.asarray(labels)))


def test_all_positive_one_cluster():
    costs = jnp.ones((8, 8, 2))
    labels = multicut_grid(costs)
    assert n_clusters(labels) == 1


def test_all_negative_singletons():
    costs = -jnp.ones((8, 8, 2))
    labels = multicut_grid(costs)
    assert n_clusters(labels) == 64


def test_all_zero_no_merges():
    """Zero cost is not attractive (RAMA contracts strictly positive edges)."""
    costs = jnp.zeros((4, 4, 2))
    assert n_clusters(multicut_grid(costs)) == 16


def test_recovers_planted_rectangles():
    gt = random_rect_partition(32, 32, min_h=4, min_w=4, min_rect_count=6,
                               seed=11)
    signs = partition_to_edge_signs(gt).astype(np.float32)
    labels = np.asarray(multicut_grid(jnp.asarray(signs)))
    # same partition: labels must be a relabeling of gt
    pairs = set(zip(gt.ravel().tolist(), labels.ravel().tolist()))
    assert len(pairs) == n_clusters(gt) == n_clusters(labels)


@pytest.mark.parametrize("mode", ["chain", "mutual", "random_mate", "hybrid"])
def test_recovers_planted_rectangles_all_modes(mode):
    gt = random_rect_partition(16, 16, min_h=4, min_w=4, min_rect_count=4,
                               seed=3)
    signs = partition_to_edge_signs(gt).astype(np.float32)
    labels = np.asarray(multicut_grid(jnp.asarray(signs), mode=mode,
                                      max_rounds=64))
    pairs = set(zip(gt.ravel().tolist(), labels.ravel().tolist()))
    assert len(pairs) == n_clusters(gt) == n_clusters(labels)


def test_clusters_are_connected():
    """Contraction only merges adjacent regions => connected clusters."""
    rng = np.random.default_rng(5)
    costs = rng.normal(size=(12, 12, 2)).astype(np.float32)
    labels = np.asarray(multicut_grid(jnp.asarray(costs)))
    from scipy import ndimage
    for lab in np.unique(labels):
        mask = labels == lab
        _, num = ndimage.label(mask)
        assert num == 1, f"cluster {lab} is disconnected"


@pytest.mark.parametrize("mode,bound", [("random_mate", 0.03),
                                        ("chain", 0.03)])
def test_near_optimal_vs_brute_force(mode, bound):
    """Parallel GAEC + ICM stays near optimal summed over random tiny
    instances (individual adversarial instances may gap higher; so does
    sequential GAEC) and never loses to the trivial partitions. Tiny grids
    run the chain/random_mate ensemble (multicut_grid picks the better
    objective), which cuts chain's summed gap from 7.2% to the measured
    1.85%; bounds set at 0.03 with margin for platform jitter."""
    total_gap = 0.0
    pos_total = 0.0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        costs = rng.normal(size=(3, 3, 2)).astype(np.float32)
        costs[:, -1, 0] = 0.0
        costs[-1, :, 1] = 0.0
        labels = np.asarray(multicut_grid(jnp.asarray(costs), mode=mode))
        ours = multicut_objective(costs, labels)
        _opt_labels, opt = brute_force_multicut(costs)
        baseline = max(multicut_objective(costs, np.zeros((3, 3), int)), 0.0)
        assert ours >= baseline - 1e-5
        assert ours <= opt + 1e-5  # sanity: never beat the exact optimum
        total_gap += opt - ours
        pos = np.clip(costs, 0, None)
        pos_total += float(pos[:, :-1, 0].sum() + pos[:-1, :, 1].sum())
    assert total_gap <= bound * pos_total, (total_gap, pos_total)


def test_batched_matches_single():
    rng = np.random.default_rng(9)
    costs = rng.normal(size=(3, 10, 10, 2)).astype(np.float32)
    batched = np.asarray(multicut_grid_batched(jnp.asarray(costs)))
    for i in range(3):
        single = np.asarray(multicut_grid(jnp.asarray(costs[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_labels_are_min_pixel_index():
    costs = jnp.ones((4, 4, 2))
    labels = np.asarray(multicut_grid(costs))
    assert labels.min() == labels.max() == 0


def test_half_split():
    costs = np.ones((6, 6, 2), np.float32)
    costs[2, :, 1] = -5.0  # strong repulsion between rows 2 and 3
    labels = np.asarray(multicut_grid(jnp.asarray(costs)))
    assert n_clusters(labels) == 2
    assert (labels[:3] == labels[0, 0]).all()
    assert (labels[3:] == labels[3, 0]).all()


def test_aggregation_beats_local_greedy():
    """A pair of regions tied by one weak attraction but strong total
    repulsion must NOT merge — requires exact cost re-accumulation, the
    property that distinguishes GAEC/RAMA from naive positive-edge CC."""
    costs = np.zeros((2, 2, 2), np.float32)
    # nodes: 0 1 / 2 3. Edges: (0,1)=+1 -> merge; (2,3)=+1 -> merge.
    costs[0, 0, 0] = 1.0
    costs[1, 0, 0] = 1.0
    # vertical edges between the two 2-node regions: +0.5 and -2 => total -1.5
    costs[0, 0, 1] = 0.5
    costs[0, 1, 1] = -2.0
    labels = np.asarray(multicut_grid(jnp.asarray(costs)))
    assert labels[0, 0] == labels[0, 1]
    assert labels[1, 0] == labels[1, 1]
    assert labels[0, 0] != labels[1, 0], "merged across net-repulsive boundary"


def test_upper_bound_certifies_solver():
    """Cycle-packing dual bound (the maximization twin of RAMA's
    lower_bound): certified >= any achievable objective, including the
    exact optimum on tiny grids."""
    from image_compression_tpu.ops.multicut import multicut_upper_bound

    for seed in range(6):
        rng = np.random.default_rng(seed)
        costs = rng.normal(size=(3, 3, 2)).astype(np.float32)
        costs[:, -1, 0] = 0.0
        costs[-1, :, 1] = 0.0
        _labels, opt = brute_force_multicut(costs)
        ub = float(multicut_upper_bound(jnp.asarray(costs)))
        assert ub >= opt - 1e-5, (ub, opt)


def test_upper_bound_tight_on_planted():
    """Signs derived from a real partition are conflict-free: the bound is
    exact and the solver attains it (a zero-gap certificate)."""
    from image_compression_tpu.ops.multicut import multicut_upper_bound

    gt = random_rect_partition(32, 32, min_h=4, min_w=4, min_rect_count=6,
                               seed=11)
    signs = partition_to_edge_signs(gt).astype(np.float32)
    ub = float(multicut_upper_bound(jnp.asarray(signs)))
    labels = np.asarray(multicut_grid(jnp.asarray(signs)))
    obj = multicut_objective(signs, labels)
    assert abs(ub - obj) < 1e-4, (ub, obj)


def test_upper_bound_gap_small_on_realistic_fields():
    """On bench-like smooth cost fields the solver's certified gap stays
    small (documents solver quality without a brute-force oracle)."""
    from benchmarks.profile_multicut import make_costs
    from image_compression_tpu.ops.multicut import multicut_upper_bound

    costs = make_costs(batch=2, size=64)
    for i in range(2):
        c = np.asarray(costs[i])
        labels = np.asarray(multicut_grid(jnp.asarray(c)))
        obj = multicut_objective(c, labels)
        ub = float(multicut_upper_bound(jnp.asarray(c)))
        assert ub >= obj - 1e-4
        gap = (ub - obj) / abs(obj)
        assert gap < 0.05, f"certified gap {gap:.3%}"


def test_odd_sizes_use_padded_hier_and_stay_correct():
    """Non-8-divisible images solve via zero-cost padding: invariants and
    label contract hold, and quality matches the sorted path."""
    rng = np.random.default_rng(2)
    costs = rng.normal(size=(30, 43, 2)).astype(np.float32)
    costs[:, -1, 0] = 0.0
    costs[-1, :, 1] = 0.0
    labels = np.asarray(multicut_grid(jnp.asarray(costs)))
    assert labels.shape == (30, 43)
    # smallest-pixel-index contract in ORIGINAL coordinates
    for lab in np.unique(labels):
        ys, xs = np.where(labels == lab)
        assert lab == (ys * 43 + xs).min()
    from scipy import ndimage
    for lab in np.unique(labels):
        assert ndimage.label(labels == lab)[1] == 1
    obj_h = multicut_objective(costs, labels)
    obj_s = multicut_objective(costs, np.asarray(
        multicut_grid(jnp.asarray(costs), hier=False)))
    scale = np.abs(costs).sum()
    assert obj_h >= obj_s - 0.01 * scale, (obj_h, obj_s)

    # trivial invariants at odd sizes
    assert len(np.unique(np.asarray(
        multicut_grid(jnp.ones((20, 26, 2)))))) == 1
    assert len(np.unique(np.asarray(
        multicut_grid(-jnp.ones((20, 26, 2)))))) == 20 * 26


def test_frozen_regions_keep_minlabel_contract():
    """Slot-cap overflow labels frozen regions by their smallest pixel
    index (assigned at freeze time, ops/multicut_hier.py), so the minlabel
    contract holds with icm_sweeps=0 where no connectivity relabel runs.
    Tiny caps on pure-noise costs force heavy freezing."""
    from image_compression_tpu.ops.multicut_hier import (hier_gaec,
                                                         smallest_pixel_labels)

    rng = np.random.default_rng(3)
    costs = jnp.asarray(rng.normal(size=(64, 64, 2)).astype(np.float32))
    res = hier_gaec(costs, caps=[64, 24, 16, 12])  # sides 8/16/32/64
    assert int(res.overflow) > 0, "test needs actual freezing"
    labels = np.asarray(smallest_pixel_labels(res))
    flat = labels.reshape(-1)
    for lab in np.unique(labels):
        assert flat[np.flatnonzero(flat == lab).min()] == lab
        assert np.flatnonzero(flat == lab).min() == lab


@pytest.mark.parametrize("mode", ["chain", "random_mate"])
@pytest.mark.parametrize("caps", [None, "half"])
def test_matrix_agg_matches_pixel_agg_bitwise(mode, caps):
    """agg="matrix" (slot-space pair matrices, P <- M^T P M per round) makes
    the exact same merge decisions as the pixel path: on integer-valued
    costs every sum is exact in f32, so labels / freeze counts / live counts
    must be BIT-IDENTICAL — heavy freezing included (random integer costs
    overflow the tight caps hundreds of times at 64px)."""
    from image_compression_tpu.ops.multicut_hier import (
        hier_gaec, lean_caps, plan_levels, smallest_pixel_labels)

    rng = np.random.default_rng(7)
    costs = jnp.asarray(
        rng.integers(-8, 9, size=(64, 64, 2)).astype(np.float32))
    caps_list = lean_caps(plan_levels(64, 64, 8), caps) if caps else None
    rp = hier_gaec(costs, mode=mode, caps=caps_list, agg="pixel")
    rm = hier_gaec(costs, mode=mode, caps=caps_list, agg="matrix")
    np.testing.assert_array_equal(np.asarray(smallest_pixel_labels(rp)),
                                  np.asarray(smallest_pixel_labels(rm)))
    assert int(rp.overflow) == int(rm.overflow)
    np.testing.assert_array_equal(np.asarray(rp.n_regions),
                                  np.asarray(rm.n_regions))
    if caps == "half":
        assert int(rm.overflow) > 0, "tight caps should force freezing"


def test_matrix_agg_resume_matches_pixel_resume():
    """The spatial continuation entry (start_level + init_state) rebuilds
    slot-space state from pixel state; resumed merges must equal the pixel
    path's (integer costs -> bitwise)."""
    from image_compression_tpu.ops.multicut_hier import (
        default_caps, hier_gaec, plan_levels, smallest_pixel_labels)

    rng = np.random.default_rng(11)
    costs_np = rng.integers(-8, 9, size=(64, 64, 2)).astype(np.float32)
    caps = default_caps(plan_levels(64, 64, 8))
    h_loc = 16
    n_local = len(plan_levels(h_loc, 64, 8))
    parts = []
    for k in range(4):  # emulate 4 strips (parallel/spatial.py flow)
        r = hier_gaec(jnp.asarray(costs_np[k * h_loc:(k + 1) * h_loc]),
                      caps=caps[:n_local], rounds_per_level=[3, 2])
        gid = np.where(np.asarray(r.frozen),
                       k * h_loc * 64 + np.asarray(r.final_gid), 0)
        parts.append((np.asarray(r.rank_img), np.asarray(r.n_regions),
                      np.asarray(r.frozen), gid))
    state = (jnp.asarray(np.concatenate([p[0] for p in parts], 0)),
             jnp.asarray(np.concatenate([p[1] for p in parts], 0)),
             jnp.asarray(np.concatenate([p[2] for p in parts], 0)),
             jnp.asarray(np.concatenate([p[3] for p in parts], 0)),
             jnp.int32(0))
    out = {}
    for agg in ("pixel", "matrix"):
        r = hier_gaec(jnp.asarray(costs_np), caps=caps,
                      rounds_per_level=[3, 2], start_level=n_local,
                      init_state=state, agg=agg)
        out[agg] = np.asarray(smallest_pixel_labels(r))
    np.testing.assert_array_equal(out["pixel"], out["matrix"])


def test_matrix_state_handoff_matches_unsharded():
    """The 7-tuple init_state (native slot-space handoff: strips carry their
    pair matrices + min-pixel vectors, parallel/spatial.py) resumes the
    matrix hierarchy with the SAME arithmetic an unsharded run performs, so
    labels must be bit-identical even on REAL-VALUED costs (where the
    5-tuple pixel rebuild is only f32-regrouping-equal)."""
    from image_compression_tpu.ops.multicut_hier import (
        default_caps, hier_gaec, plan_levels, smallest_pixel_labels)

    rng = np.random.default_rng(13)
    costs_np = rng.normal(size=(64, 64, 2)).astype(np.float32)
    caps = default_caps(plan_levels(64, 64, 8))
    h_loc = 16
    n_local = len(plan_levels(h_loc, 64, 8))
    parts = []
    for k in range(4):  # emulate 4 strips (parallel/spatial.py flow)
        r = hier_gaec(jnp.asarray(costs_np[k * h_loc:(k + 1) * h_loc]),
                      caps=caps[:n_local], rounds_per_level=[3, 2],
                      agg="matrix")
        gid = np.where(np.asarray(r.frozen),
                       k * h_loc * 64 + np.asarray(r.final_gid), 0)
        m = np.asarray(r.minpix)
        m_global = np.where(m < h_loc * 64, m + k * h_loc * 64,
                            float(64 * 64))
        parts.append((np.asarray(r.rank_img), np.asarray(r.n_regions),
                      np.asarray(r.frozen), gid, np.asarray(r.pair),
                      m_global))
    state = tuple(
        jnp.asarray(np.concatenate([p[i] for p in parts], 0))
        for i in range(4)) + (jnp.int32(0),) + tuple(
        jnp.asarray(np.concatenate([p[i] for p in parts], 0))
        for i in (4, 5))
    resumed = hier_gaec(jnp.asarray(costs_np), caps=caps,
                        rounds_per_level=[3, 2], start_level=n_local,
                        init_state=state, agg="matrix")
    unsharded = hier_gaec(jnp.asarray(costs_np), caps=caps,
                          rounds_per_level=[3, 2], agg="matrix")
    np.testing.assert_array_equal(
        np.asarray(smallest_pixel_labels(resumed)),
        np.asarray(smallest_pixel_labels(unsharded)))
    np.testing.assert_array_equal(np.asarray(resumed.n_regions),
                                  np.asarray(unsharded.n_regions))


def test_matrix_agg_through_multicut_grid():
    """hier_agg="matrix" through the public entry: trivial invariants and
    the minlabel contract, on square / non-square / padded shapes."""
    ones = jnp.ones((32, 32, 2), jnp.float32)
    assert n_clusters(multicut_grid(ones, icm_sweeps=0,
                                    hier_agg="matrix")) == 1
    lab = np.asarray(multicut_grid(-ones, icm_sweeps=0, hier_agg="matrix"))
    np.testing.assert_array_equal(lab, np.arange(32 * 32).reshape(32, 32))

    rng = np.random.default_rng(13)
    for shape in [(64, 64), (96, 64), (40, 56)]:
        costs = jnp.asarray(
            (rng.standard_normal(shape + (2,)) + 0.3).astype(np.float32))
        lab = np.asarray(multicut_grid(costs, icm_sweeps=0,
                                       hier_caps="half", hier_rounds=(2, 1),
                                       hier_agg="matrix"))
        flat = lab.reshape(-1)
        for v in np.unique(lab):
            assert np.flatnonzero(flat == v).min() == v
