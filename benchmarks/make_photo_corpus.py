"""Build the real-photo composite corpus (round-5 external validity).

Every winnable image in datasets/mixed is synthesized by
utils/pattern_generator.py — the same repo that designed the size model the
product's fallback trusts. This corpus composes REAL photographs (held-out
val sources, never synthesized here) into mosaics and photo-on-flat
collages: statistically distinct real regions interleaving horizontally
trigger the same per-block Huffman mixture mechanism without the generator
authoring the pixel statistics. The reference's premise is exactly such
compound images (readme.md:40-53).

Ground-truth partitions land in labels/<stem>.npy for the gt-oracle row of
benchmarks/bench_compression.py (is there REAL headroom?), then the product
rows measure what the shipped path keeps.

Usage:
  PYTHONPATH=. python benchmarks/make_photo_corpus.py datasets/photomix \
      [--src datasets/val] [--n 64] [--size 512] [--cell 128]
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--src", default="datasets/val",
                    help="directory of real source photos (held-out val: "
                         "no source here is a training image)")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--cell", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from image_compression_tpu.utils.pattern_generator import (
        generate_photo_collage, generate_photo_mosaic)

    src_paths = sorted(pathlib.Path(args.src).glob("*.png"))
    if not src_paths:
        raise SystemExit(f"no PNGs under {args.src}")
    photos = [np.asarray(Image.open(p).convert("RGB")) for p in src_paths]

    out = pathlib.Path(args.out_dir)
    (out / "labels").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    size = args.size

    counts: dict[str, int] = {}
    for i in range(args.n):
        if i % 2 == 0:
            tag = "photomosaic"
            img, lab = generate_photo_mosaic(size, size, photos, rng,
                                             cell=args.cell)
        else:
            tag = "photocollage"
            img, lab = generate_photo_collage(size, size, photos, rng)
        stem = f"{tag}_{i:04d}"
        Image.fromarray(img).save(out / f"{stem}.png")
        np.save(out / "labels" / f"{stem}.npy", lab.astype(np.int32))
        counts[tag] = counts.get(tag, 0) + 1

    with open(out / "MANIFEST.json", "w") as f:
        json.dump({"n": args.n, "size": size, "cell": args.cell,
                   "seed": args.seed, "src": args.src, "classes": counts,
                   "note": "real-photo composite corpus; regions are crops "
                           "of held-out val photos, not synthesized pixels; "
                           "ground-truth partitions in labels/"}, f,
                  indent=1)
    print(f"wrote {args.n} images to {out} ({counts})")


if __name__ == "__main__":
    main()
