"""Segment stats: compaction order, counts, bboxes (vs the reference's
at::_unique + atomics semantics, compute_rewards.cu:131-146)."""

import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.segment_stats import segment_stats


def test_basic():
    labels = np.asarray([[5, 5, 9], [5, 2, 9]])
    s = segment_stats(jnp.asarray(labels), k_max=4)
    assert int(s.num_segments) == 3
    assert not bool(s.overflow)
    # compact ids sorted by original value: 2 -> 0, 5 -> 1, 9 -> 2
    np.testing.assert_array_equal(np.asarray(s.inverse),
                                  [[1, 1, 2], [1, 0, 2]])
    np.testing.assert_array_equal(np.asarray(s.counts), [1, 3, 2, 0])
    np.testing.assert_array_equal(np.asarray(s.bboxes[0]), [1, 1, 1, 1])
    np.testing.assert_array_equal(np.asarray(s.bboxes[1]), [0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(s.bboxes[2]), [2, 0, 2, 1])
    # empty slot init mirrors segment_stats.cu:14-19
    np.testing.assert_array_equal(np.asarray(s.bboxes[3]), [3, 2, -1, -1])
    np.testing.assert_array_equal(np.asarray(s.valid), [1, 1, 1, 0])


def test_overflow_clamps():
    labels = np.arange(16).reshape(4, 4)
    s = segment_stats(jnp.asarray(labels), k_max=4)
    assert bool(s.overflow)
    assert int(s.num_segments) == 16
    assert int(s.inverse.max()) == 3
    assert int(s.counts.sum()) == 16


def test_counts_match_bincount(rng):
    labels = rng.integers(0, 7, (32, 32))
    s = segment_stats(jnp.asarray(labels), k_max=16)
    expected = np.bincount(labels.ravel(), minlength=16)
    np.testing.assert_array_equal(np.asarray(s.counts), expected)


def _assert_stats_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.inverse), np.asarray(b.inverse))
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.bboxes), np.asarray(b.bboxes))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    assert int(a.num_segments) == int(b.num_segments)
    assert bool(a.overflow) == bool(b.overflow)


def test_minlabel_matches_sorted_on_multicut_labels(rng):
    """The sort-free path is output-identical to the sorted path for labels
    satisfying the multicut contract (smallest pixel index, connected)."""
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel

    costs = jnp.asarray(rng.normal(size=(32, 32, 2)) + 0.4, jnp.float32)
    labels = multicut_grid(costs)  # relabel_connected runs (icm default on)
    _assert_stats_equal(segment_stats(labels, 16),
                        segment_stats_minlabel(labels, 16))


def test_minlabel_matches_sorted_on_connected_partition(rng):
    """Also identical on synthetic rectangle partitions relabeled to the
    min-pixel-index contract, including the overflow clamp."""
    from image_compression_tpu.ops.multicut import relabel_connected
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel
    from image_compression_tpu.utils.random_partition import \
        random_rect_partition

    labels = relabel_connected(
        jnp.asarray(random_rect_partition(24, 40, min_h=4, min_w=4, seed=3)))
    for k_max in (4, 64):
        _assert_stats_equal(segment_stats(labels, k_max),
                            segment_stats_minlabel(labels, k_max))
