"""Achieved compression: real on-disk bytes of compress output vs originals.

The product's purpose is smaller bytes — the reference's reward is
R = (size_img - sum est) / size_img (compute_rewards.cu:182-192) — so this
benchmark reports the ACHIEVED ratio, not the estimated one: it compresses
>= N corpus images with both the classical-Canny path and the learned
checkpoint, sums every output byte (slice PNGs + metadata.bin), and compares
to the originals' on-disk bytes. The device estimator's predicted total is
printed next to the real one as a calibration check.

Expected outcome (documented in the reference's readme.md:52-53 and
reproduced here): the slice decomposition EXPANDS natural images — per-slice
container overhead and broken filter contexts outweigh any win — which is
exactly why the RL stage exists and why its reward stays negative. This
benchmark is the honest statement of that number.

Usage:
  PYTHONPATH=.:/root/.axon_site python benchmarks/bench_compression.py \
      [--dir datasets/val] [--images 128] [--batch 32] [--k-max 256]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
CKPT = REPO / "artifacts" / "fcn_pretrained_r3_best_params"


def dir_bytes(d: pathlib.Path) -> int:
    return sum(p.stat().st_size for p in d.rglob("*") if p.is_file())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(REPO / "datasets" / "val"))
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k-max", type=int, default=256)
    ap.add_argument("--ckpt", default=str(CKPT))
    ap.add_argument("--modes", help="substring filter on mode names "
                                    "(e.g. 'fallback' re-measures only the "
                                    "fallback rows)")
    ap.add_argument("--margin", type=float,
                    help="override cfg.fallback_margin for the fallback "
                         "rows (margin sweep)")
    ap.add_argument("--classical-target", default="canny",
                    help="extractor for the classical rows (canny|graph|"
                         "slic|watershed). graph is the mixed-corpus demo "
                         "path: Canny's cut-on-either-endpoint contract "
                         "isolates every edge pixel into a singleton slice "
                         "(canny_edge.cpp:80), which no mosaic win survives")
    ap.add_argument("--merge-rounds", type=int, default=0,
                    help="estimator-guided merge refinement rounds between "
                         "the solver and the fallback "
                         "(ops/merge_refine.py; cfg.merge_refine_rounds)")
    ap.add_argument("--mode-suffix", default="",
                    help="appended to mode names in reports/per-image logs "
                         "(disambiguates runs with different --ckpt in one "
                         "JSONL, e.g. ':r4' vs ':r4rl')")
    ap.add_argument("--per-image",
                    help="write per-image (mode, stem, orig_bytes, "
                         "out_bytes, n_slices) JSONL here — feeds the "
                         "bootstrap CI over images (benchmarks/"
                         "bootstrap_ci.py): the RL-vs-pretrain product "
                         "delta is smaller than plausible per-corpus "
                         "noise without one (VERDICT r4 weak #4)")
    ap.add_argument("--gt-labels",
                    help="directory of ground-truth partition .npy files "
                         "(benchmarks/make_mixed_corpus.py layout); adds a "
                         "'gt_oracle' row that slices at the KNOWN partition "
                         "— the headroom proof (real bytes, no estimator or "
                         "solver in the loop)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config, EdgeTarget
    from image_compression_tpu.io.image_io import (
        find_image_files_recursively, load_image, to_float01_rgb)
    from image_compression_tpu.io.slicer import write_slices
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.png_estimator import \
        estimate_segment_png_sizes_fast
    from image_compression_tpu.ops.rewards import to_rgba_u8
    from image_compression_tpu.ops.segment_stats import segment_stats
    from image_compression_tpu.pipeline import (classical_costs_signed,
                                                fallback_single_slice,
                                                learned_costs, segment_batch,
                                                write_passthrough)
    from image_compression_tpu.train.checkpoint import load_params

    paths = find_image_files_recursively(args.dir, "png")[:args.images]
    if not paths:
        raise SystemExit(f"no PNGs under {args.dir}")
    images_u8 = [np.asarray(load_image(p)) for p in paths]
    orig_bytes = [p.stat().st_size for p in paths]
    n_px = [im.shape[0] * im.shape[1] for im in images_u8]

    model = EdgeUNet()
    ckpt = pathlib.Path(args.ckpt)
    params = None
    if ckpt.exists():
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 256, 256, 3), jnp.float32))
        params = load_params(ckpt, template=template)

    k_max = args.k_max

    rw = Config().reward

    @jax.jit
    def predict_totals(images_f01, labels):
        """Estimator's predicted per-image output bytes (slices only; the
        estimator does not model metadata.bin), same surplus lower bound as
        the reward (ops/rewards.py). Uses the PRODUCT estimator profile
        (entropy_correction + literal_hist + overhead_base from RewardConfig)
        so the calibration column measures the same model the fallback
        decision runs on — an earlier revision passed only
        entropy_correction and silently reported the parity profile's
        numbers (pred/real ~0.75) next to calibrated-profile decisions."""
        def one(img, lab):
            stats = segment_stats(lab, k_max)
            est = estimate_segment_png_sizes_fast(
                img, stats.inverse, stats.counts, stats.bboxes, stats.valid,
                overhead_base=rw.overhead_base,
                entropy_correction=rw.entropy_correction,
                literal_hist=rw.literal_hist,
                distance_window=rw.distance_window)
            surplus = jnp.maximum(stats.num_segments - k_max, 0)
            return (est.sum() + surplus * (rw.overhead_base + 1.0),
                    stats.num_segments)
        return jax.vmap(one)(to_rgba_u8(images_f01), labels)

    ctarget = EdgeTarget(args.classical_target)
    canny_fn = lambda b: classical_costs_signed(b, ctarget)  # noqa: E731
    cname = f"classical_{ctarget.value}"
    modes = [(cname, canny_fn, False),
             (f"{cname}_fallback", canny_fn, True)]
    if params is not None:
        learned_fn = lambda b: learned_costs(model, params, b)  # noqa: E731
        modes += [("learned_ckpt", learned_fn, False),
                  ("learned_ckpt_fallback", learned_fn, True)]

    if args.modes:
        modes = [m for m in modes if args.modes in m[0]]
    if args.mode_suffix:
        modes = [(n + args.mode_suffix, f, fb) for n, f, fb in modes]

    report = {}
    per_image_f = open(args.per_image, "a") if args.per_image else None

    def log_image(mode, stem, orig, out, n_slices):
        if per_image_f:
            per_image_f.write(json.dumps(
                {"mode": mode, "stem": stem, "orig_bytes": orig,
                 "out_bytes": out, "n_slices": n_slices}) + "\n")

    if args.gt_labels:
        # headroom ORACLE: slice at the ground-truth partition and count the
        # real output bytes — proves the corpus has genuine slicing headroom
        # independently of the extractor/solver/estimator
        gt_dir = pathlib.Path(args.gt_labels)
        out_root = pathlib.Path(tempfile.mkdtemp(prefix="benchcomp_gt_"))
        out_bytes = 0
        n_slices = []
        skipped = 0
        for j, (p, img) in enumerate(zip(paths, images_u8)):
            lab_path = gt_dir / f"{p.stem}.npy"
            if not lab_path.exists():
                skipped += 1
                continue
            lab = np.load(lab_path).astype(np.int64)
            tag = f"img_{j}"
            write_slices(img, lab, out_root, tag)
            d = out_root / tag
            db = dir_bytes(d)
            out_bytes += db
            ns = sum(1 for _ in d.glob("slice_*.png"))
            n_slices.append(ns)
            log_image("gt_oracle", p.stem, p.stat().st_size, db, ns)
        shutil.rmtree(out_root, ignore_errors=True)
        covered = [b for p_, b in zip(paths, orig_bytes)
                   if (gt_dir / f"{p_.stem}.npy").exists()]
        report["gt_oracle"] = {
            "images": len(covered), "skipped_no_labels": skipped,
            "orig_bytes": sum(covered), "out_bytes": out_bytes,
            "ratio_out_over_orig": round(out_bytes / max(sum(covered), 1), 4),
            "slices_per_img": round(float(np.mean(n_slices)), 1),
        }
        print(json.dumps({"mode": "gt_oracle", **report["gt_oracle"]}),
              flush=True)

    cfg_default = Config()
    if args.margin is not None:
        cfg_default.fallback_margin = args.margin
    for name, cost_fn, use_fallback in modes:
        out_root = pathlib.Path(tempfile.mkdtemp(prefix=f"benchcomp_{name}_"))
        out_bytes = meta_bytes = 0
        predicted = 0.0
        n_slices = []
        side_hist = [0, 0, 0, 0]  # bbox side <=32 / <=64 / <=128 / <=256
        for i in range(0, len(images_u8), args.batch):
            chunk = images_u8[i:i + args.batch]
            batch = jnp.asarray(np.stack([to_float01_rgb(im)
                                          for im in chunk]))
            mc = Config().multicut  # production solver profile
            labels = segment_batch(cost_fn(batch), mode=mc.mode,
                                   icm_sweeps=mc.icm_sweeps,
                                   hier_rounds=tuple(mc.hier_rounds),
                                   hier_caps=mc.hier_caps)
            # bbox-side histogram from the PRE-fallback labels: evidence for
            # the estimator's workload-derived class caps (class_caps,
            # VERDICT #8) — these are the segments the estimator actually
            # priced; post-fallback all-zero labelings would each add one
            # full-canvas bbox that was never estimated per segment
            labels_pre = np.asarray(labels)
            if use_fallback:
                # the production decision (pipeline.py): keep a segmentation
                # only when the size model predicts it below the whole image
                # as one slice
                labels = fallback_single_slice(
                    batch, labels, cfg_default.fallback_margin,
                    k_max=cfg_default.reward.max_segments,
                    entropy_correction=cfg_default.reward.entropy_correction,
                    literal_hist=cfg_default.reward.literal_hist,
                    overhead_base=cfg_default.reward.overhead_base,
                    distance_window=cfg_default.reward.distance_window,
                    orig_sizes=jnp.asarray(
                        orig_bytes[i:i + args.batch], jnp.float32))
            if args.merge_rounds:
                # fallback-first ordering (pipeline.py): refinement runs
                # only on the kept slicings; declined images are all-zero
                # labels and pass through unchanged
                from image_compression_tpu.ops.merge_refine import \
                    merge_refine_batch
                rw_ = Config().reward
                labels = merge_refine_batch(
                    batch, labels, k_max=rw_.max_segments,
                    rounds=args.merge_rounds,
                    overhead_base=rw_.overhead_base,
                    entropy_correction=rw_.entropy_correction,
                    literal_hist=rw_.literal_hist,
                    distance_window=rw_.distance_window)
            est, _k = predict_totals(batch, labels)
            predicted += float(jnp.sum(est))
            labels = np.asarray(labels)
            for j, (img, lab) in enumerate(zip(chunk, labels)):
                tag = f"img_{i + j}"
                for lab_id in np.unique(labels_pre[j]):
                    ys_, xs_ = np.nonzero(labels_pre[j] == lab_id)
                    side = max(ys_.max() - ys_.min(), xs_.max() - xs_.min()) + 1
                    for c, s in enumerate((32, 64, 128, 256)):
                        if side <= s:
                            side_hist[c] += 1
                            break
                if use_fallback and not lab.any():
                    # production path: the original PNG is copied verbatim
                    # as the single full-canvas slice (pipeline.py)
                    write_passthrough(paths[i + j], lab.shape, out_root, tag)
                else:
                    write_slices(img, lab.astype(np.int64), out_root, tag)
                d = out_root / tag
                db = dir_bytes(d)
                out_bytes += db
                meta_bytes += (d / "metadata.bin").stat().st_size
                ns = sum(1 for _ in d.glob("slice_*.png"))
                n_slices.append(ns)
                log_image(name, paths[i + j].stem, orig_bytes[i + j], db, ns)
        shutil.rmtree(out_root, ignore_errors=True)

        total_orig = sum(orig_bytes)
        total_px = sum(n_px)
        report[name] = {
            "images": len(images_u8),
            "orig_bytes": total_orig,
            "out_bytes": out_bytes,
            "metadata_bytes": meta_bytes,
            "ratio_out_over_orig": round(out_bytes / total_orig, 4),
            "bpp_orig": round(8 * total_orig / total_px, 3),
            "bpp_out": round(8 * out_bytes / total_px, 3),
            "predicted_slice_bytes": round(predicted),
            "predicted_ratio": round(predicted / total_orig, 4),
            "estimator_calibration_pred_over_real": round(
                predicted / max(out_bytes - meta_bytes, 1), 4),
            "slices_per_img": round(float(np.mean(n_slices)), 1),
            "single_slice_frac": round(
                float(np.mean([n == 1 for n in n_slices])), 3),
            "bbox_side_hist_32_64_128_256": side_hist,
        }
        print(json.dumps({"mode": name, **report[name]}), flush=True)

    if per_image_f:
        per_image_f.close()
    print(json.dumps({"metric": "achieved_compression", **report}))


if __name__ == "__main__":
    main()
