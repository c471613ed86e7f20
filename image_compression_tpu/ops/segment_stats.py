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


@functools.partial(jax.jit, static_argnames=("k_max",))
def segment_stats_minlabel(labels_hw: jnp.ndarray, k_max: int) -> SegmentStats:
    """Sort-free segment stats for labels satisfying the multicut output
    contract: label = smallest pixel index of its region (what multicut_grid
    returns after relabel_connected).

    A pixel is its region's representative iff its own flat index equals its
    label, so compact ids are a cumsum of representative flags (ascending
    label order — identical semantics to the sorted path). Each pixel fetches
    its root's rank with a matmul table lookup (ops/lookup.py) — no sort, no
    gather: replaces the 2*H*W-element sort that dominated segment_stats on
    TPU. Counts and bboxes come from k_max-slot one-hot reductions.
    Output-identical to segment_stats for conforming labels
    (tests/test_segment_stats.py cross-checks)."""
    from image_compression_tpu.ops.lookup import matmul_lookup

    height, width = labels_hw.shape
    n = height * width
    labels_hw = labels_hw.astype(jnp.int32)
    flat = labels_hw.reshape(-1)
    pix = jnp.arange(n, dtype=jnp.int32)
    rep = flat == pix
    rank_cum = jnp.cumsum(rep.astype(jnp.int32)) - 1
    num_segments = rank_cum[-1] + 1

    inverse = matmul_lookup(rank_cum.astype(jnp.float32),
                            flat).astype(jnp.int32).reshape(height, width)
    inverse = jnp.minimum(inverse, k_max - 1)

    # counts / bboxes via one-hot reductions over k_max slots (no atomics,
    # no scatters; bf16 one-hots are exact 0/1)
    oh = jax.nn.one_hot(inverse.reshape(-1), k_max, dtype=jnp.bfloat16)
    counts = jnp.sum(oh.astype(jnp.float32), axis=0).astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(
        jnp.int32, (height, width), 0).reshape(-1, 1).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (height, width), 1).reshape(-1, 1).astype(jnp.float32)
    inside = oh > 0
    x0 = jnp.min(jnp.where(inside, xs, float(width)), axis=0)
    y0 = jnp.min(jnp.where(inside, ys, float(height)), axis=0)
    x1 = jnp.max(jnp.where(inside, xs, -1.0), axis=0)
    y1 = jnp.max(jnp.where(inside, ys, -1.0), axis=0)
    bboxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)
    valid = jnp.arange(k_max) < num_segments
    return SegmentStats(inverse, counts, bboxes, valid,
                        num_segments.astype(jnp.int32),
                        num_segments > k_max)
