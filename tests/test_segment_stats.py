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
