"""Batched compression reward: estimated slice sizes vs. original file size.

Replaces compute_rewards_batched (compute_rewards.cu:55-196) with one fully
on-device program: label compaction + segment stats + the vectorized PNG
size estimator, batched over images with vmap — no per-image host loop, no
bbox readbacks (the reference syncs bboxes to host per image,
compute_rewards.cu:152).

Reward per image (compute_rewards.cu:182-192):
    R = (size_image - sum_k est_size_k) / size_image
        - lambda * [exactly one segment with count >= min_pixels]

Fidelity note (documented divergence): the reference converts its [0,1] float
images to uint8 RGBA *without rescaling* (chw3_f32_to_hwc4_u8_kernel rounds
the raw float, compute_rewards.cu:15-53), so its estimator effectively sees a
binary image; we rescale by 255 as intended.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_compression_tpu.ops.png_estimator import (
    estimate_segment_png_sizes, estimate_segment_png_sizes_fast)
from image_compression_tpu.ops.segment_stats import (segment_stats,
                                                     segment_stats_minlabel)


def to_rgba_u8(images_f01: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] float [0,1] -> [..., H, W, 4] uint8 with alpha=255."""
    rgb = jnp.clip(jnp.round(images_f01 * 255.0), 0, 255).astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


def _total_est_one(img_rgba, labels, *, k_max, min_pixels, l_min, beta,
                   b_match_token, gamma, overhead_base, adaptive_filter,
                   fast, minlabel, entropy_correction="none",
                   literal_hist="all", distance_window=0):
    """Per-image estimated total slice bytes + count of valid segments."""
    estimator = (estimate_segment_png_sizes_fast if fast
                 else estimate_segment_png_sizes)
    stats_fn = segment_stats_minlabel if minlabel else segment_stats
    stats = stats_fn(labels, k_max)
    seg_sizes = estimator(
        img_rgba, stats.inverse, stats.counts, stats.bboxes, stats.valid,
        min_pixels=min_pixels, l_min=l_min, beta=beta,
        b_match_token=b_match_token, gamma=gamma,
        overhead_base=overhead_base, adaptive_filter=adaptive_filter,
        entropy_correction=entropy_correction, literal_hist=literal_hist,
        distance_window=distance_window)
    # Segments beyond k_max were merged into the last compact slot by
    # segment_stats, so their pixels ARE estimated (as one pseudo
    # segment) but their per-slice container overheads are not. The
    # reference sums estimates over all K segments
    # (compute_rewards.cu:159-180); recover a lower bound on the missing
    # bytes: each surplus segment adds at least overhead_base plus one
    # filter-byte row (finalize_size, png_size_estimator.cu:10-43).
    surplus = jnp.maximum(stats.num_segments - k_max, 0)
    total_est = seg_sizes.sum() + surplus * (overhead_base + 1.0)
    k_valid = jnp.sum((stats.counts >= min_pixels) & stats.valid)
    return total_est, k_valid


@functools.partial(jax.jit,
                   static_argnames=("k_max", "min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma", "overhead_base",
                                    "adaptive_filter", "fast", "minlabel",
                                    "entropy_correction", "literal_hist",
                                    "distance_window"))
def estimated_total_sizes_batched(images_f01: jnp.ndarray,
                                  labels_bhw: jnp.ndarray, *, k_max: int = 64,
                                  min_pixels: int = 1, l_min: int = 4,
                                  beta: float = 0.012167,
                                  b_match_token: float = 18.0,
                                  gamma: float = 0.1,
                                  overhead_base: float = 9.308622,
                                  adaptive_filter: bool = True,
                                  fast: bool = True,
                                  minlabel: bool = False,
                                  entropy_correction: str = "none",
                                  literal_hist: str = "all",
                                  distance_window: int = 0) -> jnp.ndarray:
    """Estimated TOTAL compressed bytes of all slices per image: the
    sum the reward subtracts (compute_rewards.cu:159-180), exposed for
    callers that need the raw size model — e.g. the compress pipeline's
    per-image single-slice fallback decision (pipeline.py)."""
    one = functools.partial(
        _total_est_one, k_max=k_max, min_pixels=min_pixels, l_min=l_min,
        beta=beta, b_match_token=b_match_token, gamma=gamma,
        overhead_base=overhead_base, adaptive_filter=adaptive_filter,
        fast=fast, minlabel=minlabel, entropy_correction=entropy_correction,
        literal_hist=literal_hist, distance_window=distance_window)
    return jax.vmap(lambda img, lab: one(img, lab)[0])(
        to_rgba_u8(images_f01), labels_bhw)


@functools.partial(jax.jit,
                   static_argnames=("k_max", "min_pixels", "l_min", "beta",
                                    "b_match_token", "gamma", "overhead_base",
                                    "adaptive_filter", "lam", "fast",
                                    "minlabel", "entropy_correction",
                                    "literal_hist", "fallback_aware",
                                    "fallback_reward_clip",
                                    "distance_window"))
def compute_rewards_batched(images_f01: jnp.ndarray, labels_bhw: jnp.ndarray,
                            image_sizes_b: jnp.ndarray, *, k_max: int = 64,
                            min_pixels: int = 1, l_min: int = 4,
                            beta: float = 0.012167,
                            b_match_token: float = 18.0, gamma: float = 0.1,
                            overhead_base: float = 9.308622,
                            adaptive_filter: bool = True,
                            lam: float = 0.5,
                            fast: bool = True,
                            minlabel: bool = False,
                            entropy_correction: str = "none",
                            literal_hist: str = "all",
                            fallback_aware: bool = False,
                            fallback_reward_clip: float = 0.25,
                            distance_window: int = 0
                            ) -> jnp.ndarray:
    """images [B, H, W, 3] float [0,1]; labels [B, H, W] int; sizes [B]
    (on-disk byte counts). Returns rewards [B] float32. Defaults mirror
    compute_rewards.cuh:5-17.

    minlabel=True selects the sort-free segment-stats path; it requires
    labels that are each region's smallest pixel index with connected
    regions — exactly what multicut_grid emits (the RL step sets it).

    fallback_aware=True (documented divergence; cfg.reward.fallback_aware)
    scores each image against the PRODUCT's alternative instead of the
    raw file size: compress keeps a segmentation only when the size model
    predicts it below the whole image as one slice
    (pipeline.py::fallback_single_slice), so the policy's useful output is
    its advantage over that option and the reward becomes
        R = (est_whole - est_sliced) / size.
    est_whole is policy-independent, so it acts as an exact per-image
    baseline: image difficulty never reaches the gradient (the reference's
    reward punishes the policy for the image's own incompressibility,
    compute_rewards.cu:182-192). R > 0 iff the slicing would be KEPT and by
    how much it wins; R < 0 grades how badly it loses. A hard
    min(est_sliced, est_whole) — the product's realized cost — was tried
    first and REVERTED for training: every losing slicing earns the same
    floor reward, so the gradient cannot distinguish "nearly winning" from
    catastrophic, and a 50-epoch run drifted its eval from +0.053 to
    +0.038 (metrics_r4_rl_fbmin.jsonl, negative result). The
    single-segment penalty is dropped in this mode: collapsing to one
    slice IS the fallback option, not a degenerate outcome."""
    imgs_rgba = to_rgba_u8(images_f01)

    def one(img, labels, size):
        total_est, k_valid = _total_est_one(
            img, labels, k_max=k_max, min_pixels=min_pixels, l_min=l_min,
            beta=beta, b_match_token=b_match_token, gamma=gamma,
            overhead_base=overhead_base, adaptive_filter=adaptive_filter,
            fast=fast, minlabel=minlabel,
            entropy_correction=entropy_correction, literal_hist=literal_hist,
            distance_window=distance_window)
        if fallback_aware:
            # the all-zeros labeling is its own minlabel form (one region
            # whose smallest pixel index is 0), so minlabel stats apply
            est_whole, _ = _total_est_one(
                img, jnp.zeros_like(labels), k_max=k_max,
                min_pixels=min_pixels, l_min=l_min, beta=beta,
                b_match_token=b_match_token, gamma=gamma,
                overhead_base=overhead_base,
                adaptive_filter=adaptive_filter, fast=fast,
                minlabel=minlabel, entropy_correction=entropy_correction,
                literal_hist=literal_hist, distance_window=distance_window)
            # loss-tail clip: a slicing can lose by MANY file-sizes
            # (oversegmentation prices hundreds of container overheads)
            # while wins cap near +0.1, and the unclipped heavy tail
            # collapsed a 50-epoch run from eval +0.021 to -22 by epoch 11
            # (whitened advantages become tail-dominated;
            # artifacts/metrics_r4_rl_fbdiff_unclipped.jsonl). Everything
            # below "lost by fallback_reward_clip of the file" ranks
            # equally hopeless.
            return jnp.maximum((est_whole - total_est) / size,
                               -fallback_reward_clip)
        penalty = (k_valid == 1).astype(jnp.float32)
        gain = (size - total_est) / size
        return gain - lam * penalty

    return jax.vmap(one)(imgs_rgba, labels_bhw,
                         image_sizes_b.astype(jnp.float32))
