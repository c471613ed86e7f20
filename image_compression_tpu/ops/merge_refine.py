"""Estimator-guided region-merge refinement (round 5).

The measured residual between the product flagship and the gt oracle is
PARTITION GRANULARITY: the policy and the classical extractors emit 2-3x
more slices than the ground truth (BENCHMARKS.md round-5 mixed table:
10.8-21.6 slices/img vs gt 8.0), and each surplus slice pays ~68 bytes of
container floor plus broken filter contexts — exactly the bytes the
oracle recovers. Gradient training cannot close this (the per-edge
Gaussian exploration never coherently flips a whole region boundary;
measured negative results in BENCHMARKS.md), but the size model can
evaluate a merge DIRECTLY: for adjacent regions A, B, merge whenever

    est(A u B)  <  est(A) + est(B).

This is a discrete local search on the true objective — the multicut
solver optimizes the learned edge costs, and this pass then optimizes the
actual byte model over the solver's output, the same way the reference's
RL stage was supposed to learn to (training.cpp:136-192) but measured
unable to.

Per round (all on device, batched under vmap):
  1. segment stats + per-slot size estimates (the fallback's machinery);
  2. region adjacency with shared-boundary lengths via one-hot MXU
     matmuls (no gathers — TPU serializes scattered updates);
  3. a greedy conflict-free matching over the top-`max_pairs` boundaries
     (longest shared boundary first: those merges preserve the most
     filter context and are the likeliest splits-of-one-texture);
  4. ONE packed estimator call over all matched unions (pair-slot
     inverse built by relabeling, union bboxes/counts from the slot
     stats — no second stats pass);
  5. accept each merge iff its predicted saving is positive; relabel
     with the union's smallest original label (slot ids ascend with
     label values — segment_stats contract — so the minlabel invariant
     survives and downstream consumers notice nothing).

Rounds compose: 2 rounds allow up to 4-way merges. Cost is ~2 extra
estimator passes per round at compress time only (the RL loop never runs
this). Gated by cfg.merge_refine_rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_compression_tpu.ops.png_estimator import (
    estimate_segment_png_sizes_fast)
from image_compression_tpu.ops.rewards import to_rgba_u8
from image_compression_tpu.ops.segment_stats import segment_stats


def _boundary_matrix(inverse: jnp.ndarray, k_max: int) -> jnp.ndarray:
    """[k_max, k_max] float32: number of 4-neighbor pixel pairs whose two
    pixels lie in slots (a, b), a != b — the shared boundary length.
    One-hot bf16 matmuls (0/1 entries are bf16-exact, counts < 2^24
    accumulate exactly in f32); symmetrized."""
    ks = jnp.arange(k_max, dtype=jnp.int32)

    def pair_counts(left, right):
        oh_l = (left.reshape(-1, 1) == ks).astype(jnp.bfloat16)
        oh_r = (right.reshape(-1, 1) == ks).astype(jnp.bfloat16)
        return jnp.einsum("pk,pl->kl", oh_l, oh_r,
                          preferred_element_type=jnp.float32)

    bh = pair_counts(inverse[:, :-1], inverse[:, 1:])
    bv = pair_counts(inverse[:-1, :], inverse[1:, :])
    mat = bh + bh.T + bv + bv.T
    return mat * (1.0 - jnp.eye(k_max, dtype=jnp.float32))


def _match_pairs(scores: jnp.ndarray, k_max: int, max_pairs: int):
    """Greedy conflict-free matching: walk candidate pairs in descending
    shared-boundary order, accept a pair iff neither slot is already used.
    Returns (pair_a [max_pairs], pair_b, accepted mask) with a < b."""
    upper = jnp.triu(jnp.ones((k_max, k_max), bool), k=1)
    flat = jnp.where(upper, scores, 0.0).reshape(-1)
    top, idx = jax.lax.top_k(flat, max_pairs)   # sorted descending
    pa = idx // k_max
    pb = idx % k_max

    def body(i, carry):
        used, accept = carry
        a, b = pa[i], pb[i]
        ok = (top[i] > 0) & ~used[a] & ~used[b]
        hit = ok * ((jnp.arange(k_max) == a) | (jnp.arange(k_max) == b))
        return used | hit, accept.at[i].set(ok)

    used0 = jnp.zeros((k_max,), bool)
    accept0 = jnp.zeros((max_pairs,), bool)
    _, accept = jax.lax.fori_loop(0, max_pairs, body, (used0, accept0))
    return pa, pb, accept


def _merge_round(img_rgba_i32, labels, *, k_max, max_pairs, est_kwargs,
                 matchings: int = 2):
    height, width = labels.shape
    stats = segment_stats(labels, k_max)
    est = estimate_segment_png_sizes_fast(
        img_rgba_i32, stats.inverse, stats.counts, stats.bboxes,
        stats.valid, **est_kwargs)

    scores = _boundary_matrix(stats.inverse, k_max)
    # never merge the clamp bucket of an overflowed image (its "region" is
    # an arbitrary union of surplus segments) and never touch invalid slots
    ok_slot = stats.valid & ~(
        (jnp.arange(k_max) == k_max - 1) & stats.overflow)
    scores = scores * ok_slot[:, None] * ok_slot[None, :]

    # union evals want real capacity in every crop class: explicit caps
    # (max_pairs for the bounded classes, max_pairs/4 full-image slots)
    # instead of the fast path's k_max-derived ramp, whose top cap of
    # max(2, k//16) would starve large-union candidates into the
    # literal-only overflow bound and silently decline their merges.
    class_sizes = [s for s in (32, 64, 128, 256, 512)
                   if 32 <= s < min(height, width)] + [max(height, width)]
    caps = [max_pairs] * (len(class_sizes) - 1) + [max(4, max_pairs // 4)]

    # `matchings` successive disjoint matchings, each evaluated with ONE
    # fast-estimator call over a pair-slot inverse (the trick needs
    # disjoint pairs). Matching by boundary length alone is ambiguous —
    # a no-win pair can tie-win a slot and block its real merge every
    # round (measured on an equal-boundary grid split) — so candidates
    # from ALL matchings are pooled and accepted by PREDICTED SAVING,
    # greedily, conflict-free.
    cand_a, cand_b, cand_save = [], [], []
    for _ in range(matchings):
        pa, pb, accept = _match_pairs(scores, k_max, max_pairs)
        bb = stats.bboxes
        bbox_u = jnp.stack([jnp.minimum(bb[pa, 0], bb[pb, 0]),
                            jnp.minimum(bb[pa, 1], bb[pb, 1]),
                            jnp.maximum(bb[pa, 2], bb[pb, 2]),
                            jnp.maximum(bb[pa, 3], bb[pb, 3])], axis=1)
        counts_u = stats.counts[pa] + stats.counts[pb]

        # pair-slot inverse: pixels of slot pa[i]/pb[i] -> i, rest ->
        # max_pairs (no slot). Static selects — no gathers (TPU
        # serializes per-element scatter/gather rows), exact.
        inv_pairs = jnp.full((height, width), max_pairs, jnp.int32)
        for i in range(max_pairs):
            hit = accept[i] & ((stats.inverse == pa[i]) |
                               (stats.inverse == pb[i]))
            inv_pairs = jnp.where(hit, i, inv_pairs)

        est_u = estimate_segment_png_sizes_fast(
            img_rgba_i32, inv_pairs, counts_u, bbox_u, accept,
            class_caps=tuple(caps), **est_kwargs)
        # compactness guard: a union whose bbox blows up relative to the
        # parts is mostly transparent canvas — a failure mode the size
        # model's run-priced zeros could under-price. Measured INERT on
        # both benchmark checkpoints (flagship byte-identical with and
        # without it), kept as a cheap safety bound. Note what it does
        # NOT fix: refining the round-5 RL checkpoint's kept slicings
        # expanded the product 0.9807 -> 1.0157 with COMPACT unions — its
        # keep-set is simply mispriced (pred/real 0.90 vs the pretrain
        # checkpoint's 0.96), and search on a mispriced model amplifies
        # the error. Merge refinement presumes the calibration the
        # flagship checkpoint measurably has (BENCHMARKS.md round 5).
        def bbox_area(bb):
            return ((bb[:, 2] - bb[:, 0] + 1) *
                    (bb[:, 3] - bb[:, 1] + 1)).astype(jnp.float32)
        area_u = bbox_area(bbox_u)
        area_parts = bbox_area(bb[pa]) + bbox_area(bb[pb])
        compact = area_u <= 1.5 * area_parts
        cand_a.append(pa)
        cand_b.append(pb)
        cand_save.append(jnp.where(accept & compact,
                                   est[pa] + est[pb] - est_u, -jnp.inf))
        # exclude this matching's pairs from the next one's scores (slots
        # stay available — only the evaluated PAIRS are consumed)
        hit_a = jnp.zeros((k_max, k_max), bool)
        for i in range(max_pairs):
            sel = accept[i] * jax.nn.one_hot(pa[i], k_max,
                                             dtype=jnp.float32)[:, None] \
                * jax.nn.one_hot(pb[i], k_max, dtype=jnp.float32)[None, :]
            hit_a = hit_a | (sel > 0) | (sel.T > 0)
        scores = jnp.where(hit_a, 0.0, scores)

    pa = jnp.concatenate(cand_a)
    pb = jnp.concatenate(cand_b)
    save = jnp.concatenate(cand_save)

    # greedy accept by saving, conflict-free across the pooled candidates
    n_cand = save.shape[0]
    order_save, order = jax.lax.top_k(save, n_cand)
    pa_o = pa[order]
    pb_o = pb[order]

    def body(i, carry):
        used, accept = carry
        a, b = pa_o[i], pb_o[i]
        ok = (order_save[i] > 0) & ~used[a] & ~used[b]
        hit = ok * ((jnp.arange(k_max) == a) | (jnp.arange(k_max) == b))
        return used | hit, accept.at[i].set(ok)

    _, do_merge = jax.lax.fori_loop(
        0, n_cand, body,
        (jnp.zeros((k_max,), bool), jnp.zeros((n_cand,), bool)))

    # apply: pixels of slot b take slot a's (smaller) label, which IS the
    # union's minlabel (slot ids ascend with label values). The label
    # value is constant over region a, so a masked min recovers it.
    big = jnp.array(2 ** 30, labels.dtype)
    new_labels = labels
    for i in range(n_cand):
        lab_a = jnp.min(jnp.where(stats.inverse == pa_o[i], labels, big))
        new_labels = jnp.where(
            do_merge[i] & (stats.inverse == pb_o[i]),
            lab_a.astype(labels.dtype), new_labels)
    return new_labels


@functools.partial(jax.jit,
                   static_argnames=("k_max", "rounds", "max_pairs",
                                    "min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma",
                                    "overhead_base", "adaptive_filter",
                                    "entropy_correction", "literal_hist",
                                    "distance_window"))
def merge_refine_batch(images_f01: jnp.ndarray, labels_bhw: jnp.ndarray, *,
                       k_max: int = 64, rounds: int = 2,
                       max_pairs: int = 32,
                       min_pixels: int = 1, l_min: int = 4,
                       beta: float = 0.012167,
                       b_match_token: float = 18.0, gamma: float = 0.1,
                       overhead_base: float = 68.0,
                       adaptive_filter: bool = True,
                       entropy_correction: str = "miller_madow",
                       literal_hist: str = "nonmatch",
                       distance_window: int = 32768) -> jnp.ndarray:
    """Batched merge refinement: images [B, H, W, 3] f01, labels [B, H, W]
    int. Returns refined labels (same dtype). The minlabel contract is
    preserved: a merged region keeps the smaller of the two original
    labels, which IS the union's smallest pixel index when inputs are
    minlabel (slot ids ascend with label values)."""
    est_kwargs = dict(min_pixels=min_pixels, l_min=l_min, beta=beta,
                      b_match_token=b_match_token, gamma=gamma,
                      overhead_base=overhead_base,
                      adaptive_filter=adaptive_filter,
                      entropy_correction=entropy_correction,
                      literal_hist=literal_hist,
                      distance_window=distance_window)
    imgs = to_rgba_u8(images_f01).astype(jnp.int32)

    def one(img, labels):
        for _ in range(rounds):
            labels = _merge_round(img, labels, k_max=k_max,
                                  max_pairs=max_pairs,
                                  est_kwargs=est_kwargs)
        return labels

    return jax.vmap(one)(imgs, labels_bhw)
