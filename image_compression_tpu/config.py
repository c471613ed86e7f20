"""Typed runtime configuration.

Replaces the reference's compile-time header (configuration.h:5-20) and the
hyperparameters hardcoded across its entry points (pretraining.cpp:212-271,
training.cpp:68-136, compute_rewards.cuh:5-17) with one dataclass that can be
overridden from JSON files or CLI flags. Same option surface, now runtime.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import pathlib
from typing import Any


class EdgeTarget(enum.Enum):
    """Classical segmentation used as pretraining target (configuration.h:13-20)."""

    SLIC = "slic"
    CANNY = "canny"
    GRAPH = "graph"
    WATERSHED = "watershed"


@dataclasses.dataclass
class RewardConfig:
    """PNG-size-estimator reward hyperparameters (compute_rewards.cuh:9-16)."""

    min_pixels_per_segment: int = 1
    l_min: int = 4
    beta: float = 0.012167
    b_match_token: float = 18.0
    gamma: float = 0.1
    overhead_base: float = 68.0  # product default: the real PNG container
    #   floor (8 signature + 25 IHDR + ~23 IDAT framing + 12 IEND bytes).
    #   The reference's fitted 9.308622 (compute_rewards.cuh:14) under-
    #   prices every slice by ~59 bytes, which at 40+ slices/img biased the
    #   fallback toward keeping losers; the estimator FUNCTION defaults and
    #   the oracle tests keep the reference constant.
    adaptive_filter: bool = True
    lambda_single_segment: float = 0.5
    entropy_correction: str = "miller_madow"  # product default: the
    #   first-order small-sample bias term per histogram
    #   (ops/png_estimator.py) — the plug-in estimate under-prices tiny
    #   crops (round-3 calibration measured pred/real 0.90 on the
    #   always-slice learned path). "none" = reference-parity plug-in
    #   entropy (png_size_estimator.cu:281-309; the function defaults and
    #   the oracle tests stay on it).
    literal_hist: str = "nonmatch"  # product default: price literals from
    #   a histogram that excludes match-covered bytes, the way DEFLATE's
    #   literal code actually sees them (measured: fixes a 2.5x whole-image
    #   underpricing on mixed flat|noise content — BENCHMARKS.md round-4
    #   calibration table; that mispricing made the round-3 fallback reject
    #   every real slicing win). "all" = reference-parity histogram over
    #   every bbox byte (png_size_estimator.cu:365-392).
    distance_window: int = 32768  # product default: LZ-window distance term
    #   (round 5) at zlib's real window. Adds vertical-period row matches
    #   to the size model, gated by whether the match distance p*(w*C+1)
    #   fits the window at the segment's own stream geometry — slicing
    #   shrinks the stream row and restores reachability, the largest real
    #   headroom class measured in round 4 (79% on-disk win, invisible to
    #   the parity model; BENCHMARKS.md headroom table). The term also
    #   correctly cheapens the WHOLE-image side of short-period tiled
    #   content zlib already matches, so the fallback declines slicings
    #   that only looked like wins under literal pricing. 0 = reference
    #   parity (png_size_estimator.cu:397-463 detects only distance-1
    #   runs), zero cost. Oracle-tested (tests/test_estimator.py); measured
    #   keep-flip on the lzwin corpus (BENCHMARKS.md round 5).
    fallback_reward_clip: float = 0.25  # fallback_aware loss-tail clip:
    #   R = max((est_whole - est_sliced)/size, -clip). See ops/rewards.py
    #   for the measured collapse the clip prevents.
    fallback_aware: bool = False  # RL reward becomes the policy's graded
    #   advantage over the product's single-slice option,
    #   max((est_whole - est_sliced)/size, -clip), and drops the
    #   single-segment penalty (ops/rewards.py::compute_rewards_batched).
    #   Divergence from training.cpp:174 gated off by default.
    # TPU-specific: static cap on distinct segments per image for the
    # vectorized estimator (reference loops over dynamic K instead,
    # compute_rewards.cu:159-180). Segments beyond the cap are merged into
    # the last slot and estimated as one pseudo-segment, plus a per-surplus-
    # segment container-overhead lower bound (ops/rewards.py).
    max_segments: int = 64


@dataclasses.dataclass
class MulticutConfig:
    """Grid multicut solver settings (replaces RAMA's multicut_solver_options).

    The defaults are the PRODUCTION profile tuned on TPU at the production
    batch size (benchmarks/profile_batch.py, batch 128 marginal): lean
    hierarchy rounds + flat-64 slot caps + PIXEL aggregation and no ICM run
    the 256px solve in 1.03 ms/img at a certified optimality gap of 0.017%
    (vs 7.3 ms/img at 0.011% for the conservative profile icm_sweeps=8 /
    hier_rounds=None / hier_caps=None, which remains multicut_grid's own
    function default). Batch size changes the agg ranking: round-3's
    mid-round "matrix 0.70 ms/img" was a batch-8 marginal figure; at batch
    128 the same matrix profile measures 1.77 ms/img (1.54 with the fused
    Pallas leaf) vs pixel's 1.03 — both paths are VPU-compute-bound there
    and the matrix path's [T, S, S] round/transition elementwise volume
    exceeds the pixel path's, so hier_agg="pixel" is the deployment
    default. "matrix" remains the right choice for the spatially sharded
    solve (native slot-space strip handoff, parallel/spatial.py)."""

    max_rounds: int = 3           # full-phase re-aggregation rounds (fixpoint bound)
    mode: str = "chain"           # chain | mutual | random_mate | hybrid
    icm_sweeps: int = 0           # local-move refinement sweeps after contraction
    matchings_per_round: int = 4  # matching passes per cost re-aggregation
    hier_rounds: tuple = (2, 1)   # dense-hierarchy rounds/level (last repeats)
    hier_caps: str | None = "flat64"  # lean_caps preset | None = default caps
    hier_agg: str = "pixel"       # pixel re-aggregation | "matrix" slot-space
    #                               pair matrices (same merges either way;
    #                               ops/multicut_hier.py)
    hier_leaf: str = "auto"       # matrix agg only: fused Pallas leaf for
    #                               levels 0-1 (ops/multicut_leaf.py)


@dataclasses.dataclass
class PretrainConfig:
    """Supervised phase (pretraining.cpp:212-271)."""

    lr: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 8
    epochs: int = 10
    pos_weight: float = 0.1       # connect-class weight; <1 emphasizes cuts (pretraining.cpp:264-267)
    w_sign: float = 1.0
    w_sigma: float = 0.01
    sigma_min: float = 0.1
    sigma_max: float = 0.9
    val_every: int = 100
    max_train_images: int = 100_000
    max_val_images: int = 128
    target_ensemble: bool = False  # train against ALL FOUR classical
    #   extractors, cycled per batch (validation stays on edge_target for
    #   protocol comparability). BCE is linear in the target, so cycling
    #   binary targets optimizes the same objective as the soft 4-way mean
    #   — without breaking the packed-bits target caches. Divergence from
    #   the reference's single compile-time EDGE_TARGET (configuration.h:20)
    #   gated off by default; VERDICT r3 next #7.


@dataclasses.dataclass
class RLConfig:
    """Online REINFORCE phase (training.cpp:68-233)."""

    lr: float = 1e-4
    batch_size: int = 8
    epochs: int = 50
    mu_scale: float = 2.0         # mu = 2*tanh(0.5*raw)   (training.cpp:154-157)
    sigma_min: float = 0.1
    sigma_max: float = 0.9
    entropy_coef: float = 1e-4
    baseline_momentum: float = 0.99
    grad_clip: float = 1.0
    eval_every: int = 100
    max_train_images: int = 1_000_000
    max_val_images: int = 64
    # --- variance-reduction upgrades (documented divergence: the reference's
    # stateless REINFORCE does not converge, readme.md:53; these are gated
    # behind flags so the default remains reference-parity) ---------------
    sampler: str = "single"       # "single" (training.cpp:161) | "antithetic"
    #   antithetic: mirrored pairs w = mu +- sigma*eps share one noise draw;
    #   the pair-difference advantage cancels per-image reward variance
    #   exactly (image difficulty never reaches the gradient)
    baseline: str = "ema"         # "ema" (ema_baseline.hpp) | "value"
    #   value: a small conv net predicts the per-image reward; adv = r - V(x)
    value_lr: float = 1e-3        # value-net optimizer (baseline="value")
    value_loss_coef: float = 1.0  # logged only; the nets are trained separately
    ppo_epochs: int = 0           # 0 = plain REINFORCE update (reference
    #   parity); K >= 1 runs K clipped-surrogate gradient steps per sampled
    #   batch (train/policy.py::ppo_clip_loss), reusing the solver+reward
    #   results — the multicut solve dominates the step, so extra policy
    #   epochs are nearly free. K=1 reproduces the REINFORCE gradient.
    ppo_clip: float = 0.2         # per-edge ratio clip window (1 +- clip)
    whiten: bool = True           # standardize advantages by the batch std
    #   (training.cpp:180, reference parity). Turn OFF for the
    #   fallback-aware reward: est_whole already removes per-image
    #   difficulty, so the residual signal is tiny (+-0.05) and dividing
    #   by its std amplifies SAMPLING noise to unit scale — measured: a
    #   whitened run walked its eval from +0.020 to -0.035 within one
    #   epoch and plateaued there (metrics_r4_rl_fbclip_whiten.jsonl).
    #   Unwhitened advantages keep the gradient proportional to the real
    #   byte stakes.


@dataclasses.dataclass
class Config:
    """Top-level framework configuration."""

    dataset_dir: str = "dataset/CLS-LOC/train"
    val_dataset_dir: str = "dataset/CLS-LOC/val"
    test_dataset_dir: str = "dataset/CLS-LOC/test"
    results_dir: str = "./results"
    cache_dir: str = "./.cache/imagecompression"
    image_format: str = "png"
    compression_level: int = 4    # PNG/zlib level (configuration.h:11)
    slice_container: str = "files"  # "files" = reference layout (one PNG per
    #                                 slice + metadata.bin); "pack" = one
    #                                 SLPK file per image (io/pack.py)
    edge_target: EdgeTarget = EdgeTarget.GRAPH
    image_size: int = 256         # training resolution (training.cpp:85-86)
    compress_fallback: bool = True  # per-image single-slice fallback: keep a
    #   segmentation only when the on-device estimator predicts its slices
    #   total below fallback_margin x the whole image as ONE slice — the
    #   reward's R > 0 condition applied at compress time
    #   (compute_rewards.cu:182-192; pipeline.py::fallback_single_slice).
    #   Product divergence: the reference always slices and measurably
    #   expands natural images (compress.cpp:93-153; BENCHMARKS.md).
    merge_refine_rounds: int = 2  # product default: estimator-guided
    #   region-merge refinement AFTER the fallback decision
    #   (ops/merge_refine.py): per round, adjacent region pairs are
    #   matched by shared-boundary length and merged when the size model
    #   prices the union below the parts. Discrete local search on the
    #   true byte objective — closes the partition-granularity gap the
    #   RL gradient measurably cannot (BENCHMARKS.md round 5: policies
    #   emit 2-3x the gt slice count; each surplus slice costs ~68
    #   container bytes). Rounds sweep, both corpora: mixed flagship
    #   0.9731 -> 0.9662 at x2 (paired CI [-0.0095, -0.0042]) -> 0.9637
    #   at x3 (paired [-0.0039, -0.0014]); lzwin 0.353 -> 0.269 at x2
    #   (oracle 0.267) but 0.281 at x3 — the third round's merges sit
    #   inside the size model's error margin (its calibration drifts to
    #   1.8 on the over-merged strips) and lzwin's +1.2pp regression is
    #   4x mixed's -0.3pp gain, so 2 is the default. No-op on
    #   fallen-back images (all-zero labels have no pairs): the naturals
    #   never-expand guarantee is untouched. Compress-time only (the RL
    #   reward never runs it).
    fallback_margin: float = 1.0  # keep iff est_sliced < margin *
    #   min(est_whole, original bytes). Round 3 needed a global 0.9 fudge
    #   because the parity estimator under-priced small crops
    #   (small-sample entropy bias) and the fallback's real cost is the
    #   ORIGINAL file, not the re-encode model. Round 4 removes both
    #   causes at the source: the calibrated estimator profile above
    #   (miller_madow + nonmatch + real container overhead) fixes the
    #   bias per histogram, and the passthrough is priced explicitly
    #   (pipeline.py::fallback_single_slice orig_sizes), so the margin
    #   returns to the decision-theoretic 1.0. Measured:
    #   benchmarks/bench_compression.py, BENCHMARKS.md round-4 table.

    reward: RewardConfig = dataclasses.field(default_factory=RewardConfig)
    multicut: MulticutConfig = dataclasses.field(default_factory=MulticutConfig)
    pretrain: PretrainConfig = dataclasses.field(default_factory=PretrainConfig)
    rl: RLConfig = dataclasses.field(default_factory=RLConfig)

    @staticmethod
    def from_json(path: str | pathlib.Path) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict[str, Any]) -> "Config":
        cfg = Config()
        for key, value in raw.items():
            if not hasattr(cfg, key):
                raise KeyError(f"Unknown config key: {key}")
            current = getattr(cfg, key)
            if dataclasses.is_dataclass(current) and isinstance(value, dict):
                setattr(cfg, key, dataclasses.replace(current, **value))
            elif key == "edge_target":
                setattr(cfg, key, EdgeTarget(value))
            else:
                setattr(cfg, key, value)
        return cfg

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["edge_target"] = self.edge_target.value
        return d
