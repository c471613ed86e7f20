"""bpp parity vs the reference encoder (BASELINE.md: within 1%).

Segments corpus images, slices each segmentation into the same per-segment
RGBA crops, and encodes every crop twice: through this framework's native
zlib PNG encoder at compression level 4 (native/pngio.cpp — the write_slices
path) and through OpenCV's imwrite with IMWRITE_PNG_COMPRESSION=4 — exactly
the reference's image_writer settings (image_writer.cpp:4-8,
configuration.h:11). Reports total bytes and the ratio.

Usage: PYTHONPATH=. python benchmarks/bench_bpp.py [--images N] [--dir D]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--dir", default="datasets/corpus")
    ap.add_argument("--checkpoint", help="learned costs instead of canny")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config, EdgeTarget
    from image_compression_tpu.io import native
    from image_compression_tpu.io.image_io import load_image, to_float01_rgb
    from image_compression_tpu.io.slicer import (compute_bounding_boxes,
                                                 slice_image)
    from image_compression_tpu.io.image_io import ensure_rgba
    from image_compression_tpu.pipeline import (classical_costs_signed,
                                                learned_costs, segment_batch)

    assert native.available(), "native encoder required"
    cfg = Config()

    paths = sorted(pathlib.Path(args.dir).glob("*.png"))[:args.images]
    assert paths, f"no images under {args.dir}"
    imgs = [load_image(p) for p in paths]
    batch = jnp.asarray(np.stack([to_float01_rgb(im) for im in imgs]))

    if args.checkpoint:
        from image_compression_tpu.models.unet import EdgeUNet
        from image_compression_tpu.train.checkpoint import load_params
        params = load_params(args.checkpoint)
        costs = learned_costs(EdgeUNet(), params, batch)
    else:
        costs = classical_costs_signed(batch, EdgeTarget.CANNY)
    labels = np.asarray(segment_batch(costs, mode=cfg.multicut.mode,
                                      max_rounds=cfg.multicut.max_rounds,
                                      icm_sweeps=cfg.multicut.icm_sweeps))

    total_native = total_cv2 = total_raw = n_slices = 0
    per_image_ratio = []
    for img, lab in zip(imgs, labels):
        rgba = ensure_rgba(np.asarray(img))
        lab64 = lab.astype(np.int64)
        boxes = compute_bounding_boxes(lab64)
        img_native = img_cv2 = 0
        for label, box in boxes.items():
            piece = slice_image(rgba, lab64, label, box)
            data = native.encode_png(piece, cfg.compression_level)
            ok, buf = cv2.imencode(
                ".png", cv2.cvtColor(piece, cv2.COLOR_RGBA2BGRA),
                [cv2.IMWRITE_PNG_COMPRESSION, cfg.compression_level])
            assert ok
            img_native += len(data)
            img_cv2 += len(buf)
            total_raw += piece.nbytes
            n_slices += 1
        total_native += img_native
        total_cv2 += img_cv2
        per_image_ratio.append(img_native / max(img_cv2, 1))

    px = sum(im.shape[0] * im.shape[1] for im in imgs)
    r = np.asarray(per_image_ratio)
    print(f"images={len(imgs)} slices={n_slices}")
    print(f"native  bytes={total_native}  bpp={8*total_native/px:.4f}")
    print(f"opencv  bytes={total_cv2}  bpp={8*total_cv2/px:.4f}")
    print(f"native/opencv ratio = {total_native/total_cv2:.4f} "
          f"({(total_native/total_cv2-1)*100:+.2f}%)  per-image "
          f"mean={r.mean():.4f} sd={r.std():.4f} "
          f"min={r.min():.4f} max={r.max():.4f}")


if __name__ == "__main__":
    main()
