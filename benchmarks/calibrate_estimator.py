"""Per-slice estimator calibration: predicted vs REAL encoded bytes, grouped
by crop class, for the reference-parity estimator and the calibrated profile
(entropy_correction="miller_madow" + literal_hist="nonmatch" +
overhead_base=68).

For every image: segment (ground-truth labels if --gt-labels, else the
classical extractor), then for every segment slot compare the estimator's
size against the bytes the product writer actually produces for that slice
(same crop/mask/RGB-vs-RGBA logic as io/slicer.py, same encoder). The
whole-image single-slice estimate is calibrated the same way. This is the
evidence VERDICT r3 next #2 asks for (pred/real per class) and the basis
for the fallback_margin default.

Usage:
  PYTHONPATH=.:/root/.axon_site python benchmarks/calibrate_estimator.py \
      [--dir datasets/mixed] [--gt-labels datasets/mixed/labels] \
      [--images 64] [--target canny|graph] [--ckpt PATH]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]

CLASS_EDGES = (32, 64, 128, 10 ** 9)
CLASS_NAMES = ("<=32", "<=64", "<=128", ">128")

PROFILES = {
    "parity": {},
    "calibrated": dict(entropy_correction="miller_madow",
                       literal_hist="nonmatch", overhead_base=68.0),
    # the SHIPPED round-5 profile: calibrated + the LZ-window distance term
    # (config.py RewardConfig defaults)
    "product": dict(entropy_correction="miller_madow",
                    literal_hist="nonmatch", overhead_base=68.0,
                    distance_window=32768),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(REPO / "datasets" / "mixed"))
    ap.add_argument("--gt-labels")
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--target", default="canny")
    ap.add_argument("--ckpt")
    ap.add_argument("--k-max", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config, EdgeTarget
    from image_compression_tpu.io.image_io import (
        encode_image_bytes, ensure_rgba, find_image_files_recursively,
        load_image, to_float01_rgb)
    from image_compression_tpu.io.slicer import (compute_bounding_boxes,
                                                 slice_image)
    from image_compression_tpu.ops.png_estimator import \
        estimate_segment_png_sizes
    from image_compression_tpu.ops.rewards import to_rgba_u8
    from image_compression_tpu.ops.segment_stats import segment_stats
    from image_compression_tpu.pipeline import (classical_costs_signed,
                                                learned_costs, segment_batch)

    paths = find_image_files_recursively(args.dir, "png")[:args.images]
    if not paths:
        raise SystemExit(f"no PNGs under {args.dir}")

    cost_fn = None
    if args.ckpt:
        from image_compression_tpu.models.unet import EdgeUNet
        from image_compression_tpu.train.checkpoint import load_params
        model = EdgeUNet()
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 256, 256, 3), jnp.float32))
        params = load_params(args.ckpt, template=template)
        cost_fn = lambda b: learned_costs(model, params, b)  # noqa: E731
    elif not args.gt_labels:
        target = EdgeTarget(args.target)
        cost_fn = lambda b: classical_costs_signed(b, target)  # noqa: E731

    k_max = args.k_max
    mc = Config().multicut

    def make_estimator(profile):
        @jax.jit
        def one(img_f01, lab):
            stats = segment_stats(lab, k_max)
            # flat estimator: exact, no crop-class spill noise in the
            # calibration signal
            est = estimate_segment_png_sizes(
                to_rgba_u8(img_f01), stats.inverse, stats.counts,
                stats.bboxes, stats.valid, **PROFILES[profile])
            return est, stats.bboxes, stats.valid, stats.inverse
        return one

    est_fns = {p: make_estimator(p) for p in PROFILES}

    def estimates(img_f01, labels, profile):
        return est_fns[profile](img_f01, labels)

    # accumulators: [profile][class] -> [pred_sum, real_sum, n]
    acc = {p: {c: [0.0, 0, 0] for c in CLASS_NAMES} for p in PROFILES}
    whole_acc = {p: [0.0, 0, 0, 0] for p in PROFILES}

    for path in paths:
        img_u8 = np.asarray(load_image(path))
        img_f01 = jnp.asarray(to_float01_rgb(img_u8))
        if args.gt_labels:
            lab_path = pathlib.Path(args.gt_labels) / f"{path.stem}.npy"
            if not lab_path.exists():
                continue
            labels = np.load(lab_path).astype(np.int64)
        else:
            costs = cost_fn(img_f01[None])
            labels = np.asarray(segment_batch(
                costs, mode=mc.mode, icm_sweeps=mc.icm_sweeps,
                hier_rounds=tuple(mc.hier_rounds),
                hier_caps=mc.hier_caps)[0]).astype(np.int64)

        rgba = ensure_rgba(img_u8)
        boxes = compute_bounding_boxes(labels)
        # real bytes per label: exactly the writer's crop/mask/RGB logic
        real_by_label = {}
        for lab_id, box in boxes.items():
            piece = slice_image(rgba, labels, lab_id, box)
            real_by_label[lab_id] = len(encode_image_bytes(piece, 4))

        lab_dev = jnp.asarray(labels, jnp.int32)
        for profile in PROFILES:
            est, bboxes, valid, inverse = estimates(img_f01, lab_dev,
                                                    profile)
            est = np.asarray(est)
            bboxes = np.asarray(bboxes)
            valid = np.asarray(valid)
            inv = np.asarray(inverse)
            # slot -> original label id (constant over the slot's pixels)
            for slot in range(k_max):
                if not valid[slot]:
                    continue
                m = inv == slot
                lab_id = int(labels[m].flat[0])
                side = max(bboxes[slot][2] - bboxes[slot][0],
                           bboxes[slot][3] - bboxes[slot][1]) + 1
                cls = CLASS_NAMES[next(i for i, e in enumerate(CLASS_EDGES)
                                       if side <= e)]
                a = acc[profile][cls]
                a[0] += float(est[slot])
                a[1] += real_by_label[lab_id]
                a[2] += 1
            # whole-image single slice
            est_w, _, _, _ = estimates(img_f01, jnp.zeros_like(lab_dev),
                                       profile)
            wa = whole_acc[profile]
            wa[0] += float(np.asarray(est_w)[0])
            wa[1] += len(encode_image_bytes(img_u8, 4))
            wa[2] += 1
            wa[3] += path.stat().st_size  # the passthrough's REAL cost

    out = {"dir": args.dir, "images": len(paths),
           "labels": ("gt" if args.gt_labels
                      else ("learned" if args.ckpt else args.target))}
    for profile in PROFILES:
        rows = {}
        for cls, (pred, real, n) in acc[profile].items():
            if n:
                rows[cls] = {"n": n, "pred_over_real": round(pred / real, 4)}
        wp, wr, wn, worig = whole_acc[profile]
        rows["whole_image"] = {"n": wn,
                               "pred_over_real": round(wp / max(wr, 1), 4),
                               "pred_over_original": round(
                                   wp / max(worig, 1), 4)}
        out[profile] = rows
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
