"""Per-segment statistics: label compaction, pixel counts, bounding boxes.

Replaces the reference's at::_unique + atomics pass
(compute_rewards.cu:131-146, segment_stats.cu:11-42) with one sort-based
compaction and segmented min/max/sum reductions — no atomics, no host
round-trips, fully batched under vmap.

Compact ids are assigned in ascending order of the original label values,
matching at::_unique(sorted=true). Shapes are static: up to k_max segments
are tracked; if an image has more, the surplus segments are clamped into the
last bucket (the `overflow` flag reports this).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SegmentStats(NamedTuple):
    inverse: jnp.ndarray   # [H, W] int32 compact ids in [0, k_max)
    counts: jnp.ndarray    # [k_max] int32 pixel counts (0 for empty slots)
    bboxes: jnp.ndarray    # [k_max, 4] int32 (x0, y0, x1, y1); empty: (W, H, -1, -1)
    valid: jnp.ndarray     # [k_max] bool
    num_segments: jnp.ndarray  # scalar int32 (true K, may exceed k_max)
    overflow: jnp.ndarray  # scalar bool: K > k_max


@functools.partial(jax.jit, static_argnames=("k_max",))
def segment_stats(labels_hw: jnp.ndarray, k_max: int) -> SegmentStats:
    height, width = labels_hw.shape
    n = height * width
    flat = labels_hw.reshape(-1).astype(jnp.int32)

    # sorted-rank compaction (at::_unique sorted=true semantics). One
    # multi-operand sort carries pixel coordinates along; the inverse comes
    # from a second small sort instead of a permutation scatter, and all
    # reductions run on sorted keys (TPU serializes scattered updates).
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1).reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_vals, idx_s, xs_s, ys_s = jax.lax.sort(
        (flat, idx, xs, ys), num_keys=1)
    is_new = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_vals[1:] != sorted_vals[:-1]])
    rank_sorted = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    num_segments = rank_sorted[-1] + 1
    rank_sorted = jnp.minimum(rank_sorted, k_max - 1)
    _, inverse_flat = jax.lax.sort((idx_s, rank_sorted), num_keys=1)

    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), rank_sorted,
                                 num_segments=k_max, indices_are_sorted=True)
    x0 = jax.ops.segment_min(xs_s, rank_sorted, num_segments=k_max,
                             indices_are_sorted=True)
    y0 = jax.ops.segment_min(ys_s, rank_sorted, num_segments=k_max,
                             indices_are_sorted=True)
    x1 = jax.ops.segment_max(xs_s, rank_sorted, num_segments=k_max,
                             indices_are_sorted=True)
    y1 = jax.ops.segment_max(ys_s, rank_sorted, num_segments=k_max,
                             indices_are_sorted=True)

    valid = jnp.arange(k_max) < num_segments
    # empty-slot init values mirror segment_stats.cu:14-19
    x0 = jnp.where(valid, x0, width)
    y0 = jnp.where(valid, y0, height)
    x1 = jnp.where(valid, x1, -1)
    y1 = jnp.where(valid, y1, -1)
    bboxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)
    return SegmentStats(inverse_flat.reshape(height, width),
                        counts.astype(jnp.int32), bboxes, valid,
                        num_segments.astype(jnp.int32),
                        num_segments > k_max)
