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


@functools.partial(jax.jit, static_argnames=("slots",))
def dense_ranks(labels_hw: jnp.ndarray, slots: int) -> jnp.ndarray:
    """Per-pixel dense region rank for minlabel-contract labels (label =
    smallest pixel index of its connected region): rank in [0, n_regions),
    ascending label order, or -1 where the rank exceeds `slots` (callers
    treat those regions as frozen). Same two-level representative counting
    as segment_stats_minlabel, without the overflow clamp — for slot-space
    algorithms over the region graph (e.g. ops/slic.py's absorption)."""
    height, width = labels_hw.shape
    n = height * width
    labels_hw = labels_hw.astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    rep = labels_hw == ys * width + xs

    row_counts = jnp.sum(rep.astype(jnp.int32), axis=1)
    cum_rows = jnp.cumsum(row_counts)
    row_start = cum_rows - row_counts
    num_segments = cum_rows[-1]
    row_cum = jnp.cumsum(rep.astype(jnp.int32), axis=1)

    ks = jnp.arange(slots, dtype=jnp.int32)
    row_k = jnp.sum((cum_rows[:, None] <= ks[None, :])
                    .astype(jnp.int32), axis=0)
    row_k_c = jnp.minimum(row_k, height - 1)
    sel = row_cum[row_k_c]
    tgt = ks - row_start[row_k_c]
    x_k = jnp.sum((sel <= tgt[:, None]).astype(jnp.int32), axis=1)
    label_of_slot = jnp.where(ks < num_segments, row_k * width + x_k, n)

    ge = labels_hw[..., None] >= label_of_slot[None, None, :]
    rank = jnp.sum(ge.astype(jnp.int32), axis=-1) - 1
    # a label beyond the last slot's label has rank == slots - 1 here but
    # really overflows; detect via equality with the slot's label
    eq = jnp.einsum(
        "hwk,k->hw",
        (labels_hw[..., None] == label_of_slot[None, None, :])
        .astype(jnp.bfloat16),
        jnp.ones((slots,), jnp.bfloat16),
        preferred_element_type=jnp.float32) > 0
    return jnp.where(eq, rank, -1)


@functools.partial(jax.jit, static_argnames=("k_max",))
def segment_stats_minlabel(labels_hw: jnp.ndarray, k_max: int) -> SegmentStats:
    """Sort-free segment stats for labels satisfying the multicut output
    contract: label = smallest pixel index of its region (what multicut_grid
    returns after relabel_connected).

    A pixel is its region's representative iff its own flat index equals its
    label, so compact ids are ranks of representatives in pixel order
    (ascending label order — identical semantics to the sorted path). The
    rank-k representative's pixel index (label_of_slot) comes from TWO-LEVEL
    counting — per-row rep counts locate its row via a [H, k_max] compare,
    a W-wide row gather + compare locates its column — so nothing pixel-sized
    is ever sorted, scanned globally, gathered per element, or scattered.
    One [H, W, k_max] bf16 one-hot (equality against label_of_slot, with
    rank >= k_max clamping into slot k_max-1 exactly like the sorted path)
    is materialized once and read three times: compact ids via a slot-index
    matmul, and counts/bboxes via row/column marginal count matrices
    ([H, k_max] / [W, k_max]) whose min/max over the short axis yields the
    boxes. Output-identical to segment_stats for conforming labels
    (tests/test_segment_stats.py cross-checks)."""
    if k_max > 256:
        # the compact-id einsum below carries slot indices in bf16, which is
        # integer-exact only through 256; larger k_max would silently corrupt
        # inverse ids
        raise ValueError(f"segment_stats_minlabel requires k_max <= 256, "
                         f"got {k_max}")
    height, width = labels_hw.shape
    n = height * width
    labels_hw = labels_hw.astype(jnp.int32)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    rep = labels_hw == ys * width + xs

    row_counts = jnp.sum(rep.astype(jnp.int32), axis=1)      # [H]
    cum_rows = jnp.cumsum(row_counts)                        # [H] inclusive
    row_start = cum_rows - row_counts                        # [H] exclusive
    num_segments = cum_rows[-1]
    row_cum = jnp.cumsum(rep.astype(jnp.int32), axis=1)      # [H, W] inclusive

    ks = jnp.arange(k_max, dtype=jnp.int32)
    # row holding the rank-k representative: first y with cum_rows > k
    row_k = jnp.sum((cum_rows[:, None] <= ks[None, :])
                    .astype(jnp.int32), axis=0)              # [k_max]
    row_k_c = jnp.minimum(row_k, height - 1)
    sel = row_cum[row_k_c]                                   # [k_max, W]
    tgt = ks - row_start[row_k_c]                            # rank within row
    # first x with row_cum > tgt (sel is non-decreasing along W)
    x_k = jnp.sum((sel <= tgt[:, None]).astype(jnp.int32), axis=1)
    label_of_slot = jnp.where(ks < num_segments,
                              row_k * width + x_k, n)        # [k_max]

    # one-hot over slots: equality for k < k_max-1; the last slot also
    # absorbs overflow pixels (rank >= k_max), matching the sorted clamp
    lab3 = labels_hw[..., None]
    oh = jnp.where(ks[None, None, :] == k_max - 1,
                   lab3 >= label_of_slot[k_max - 1],
                   lab3 == label_of_slot[None, None, :]).astype(jnp.bfloat16)

    # compact ids: each pixel's single nonzero slot times its index (exact:
    # bf16 holds integers through 256 and each sum has one nonzero term)
    inverse = jnp.einsum("hwk,k->hw", oh, ks.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32).astype(jnp.int32)

    # marginal count matrices (entries <= H, W <= bf16-exact via f32 acc)
    col_cnt = jnp.sum(oh, axis=0, dtype=jnp.float32)         # [W, k_max]
    row_cnt = jnp.sum(oh, axis=1, dtype=jnp.float32)         # [H, k_max]
    counts = jnp.sum(col_cnt, axis=0).astype(jnp.int32)      # [k_max]

    xs_w = jnp.arange(width, dtype=jnp.int32)[:, None]
    ys_h = jnp.arange(height, dtype=jnp.int32)[:, None]
    x0 = jnp.min(jnp.where(col_cnt > 0, xs_w, width), axis=0)
    x1 = jnp.max(jnp.where(col_cnt > 0, xs_w, -1), axis=0)
    y0 = jnp.min(jnp.where(row_cnt > 0, ys_h, height), axis=0)
    y1 = jnp.max(jnp.where(row_cnt > 0, ys_h, -1), axis=0)
    bboxes = jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)
    valid = ks < num_segments
    return SegmentStats(inverse, counts, bboxes, valid,
                        num_segments.astype(jnp.int32),
                        num_segments > k_max)
