"""Build the mixed-compressibility benchmark corpus (known headroom).

Composites from the pattern generator (utils/pattern_generator.py — the
reference ships the building blocks at pattern_generator.cpp:11-220 but
never composes them): mosaics of statistically distinct noise cells where
slicing PROVABLY beats whole-image PNG (DEFLATE's per-block Huffman pays the
mixture entropy of interleaved regions; per-region slices restore separate
tables), plus flat+noise controls where slicing does NOT win and the
product's fallback must decline.

Every image ships its ground-truth partition (labels/<stem>.npy) so
benchmarks/bench_compression.py --gt-labels can measure the headroom
ORACLE: real encoded bytes of the known-partition slices vs the original.

Usage:
  python benchmarks/make_mixed_corpus.py datasets/mixed [--n 128] [--size 256]
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes",
                    help="comma list overriding the default 4-class cycle "
                         "(names from MOSAIC_GENERATORS, e.g. 'lz_period' "
                         "for the round-5 LZ-window corpus, or "
                         "'sigma,anticorr,mixedmos,flatnoise,lz_period' for "
                         "the 5-class mix)")
    args = ap.parse_args()

    from image_compression_tpu.utils.pattern_generator import (
        generate_anticorr_mosaic, generate_flat_noise_composite,
        generate_lz_period, generate_mixed_mosaic, generate_sigma_mosaic)

    out = pathlib.Path(args.out_dir)
    (out / "labels").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    size = args.size

    # 3/4 winnable mosaics (varying cell size), 1/4 fallback controls
    # 64/128px cells measured best (32px: 64 slices of overhead eat the
    # win; BENCHMARKS.md round-4 headroom table)
    cells = [64, 128]
    makers = {
        "sigma": lambda rng, c: generate_sigma_mosaic(size, size, rng,
                                                      cell=c),
        "anticorr": lambda rng, c: generate_anticorr_mosaic(size, size, rng,
                                                            cell=c),
        "mixedmos": lambda rng, c: generate_mixed_mosaic(size, size, rng,
                                                         cell=c),
        "flatnoise": lambda rng, c: generate_flat_noise_composite(size, size,
                                                                  rng),
        "lz_period": lambda rng, c: generate_lz_period(size, size, rng),
    }
    cycle = (args.classes.split(",") if args.classes
             else ["sigma", "anticorr", "mixedmos", "flatnoise"])
    unknown = set(cycle) - set(makers)
    if unknown:
        raise SystemExit(f"unknown classes: {unknown}")
    recipes = []
    for i in range(args.n):
        tag = cycle[i % len(cycle)]
        c = cells[(i // len(cycle)) % len(cells)]
        recipes.append((tag, lambda rng, tag=tag, c=c: makers[tag](rng, c)))

    counts: dict[str, int] = {}
    for i, (tag, fn) in enumerate(recipes):
        img, lab = fn(rng)
        stem = f"{tag}_{i:04d}"
        Image.fromarray(img).save(out / f"{stem}.png")
        np.save(out / "labels" / f"{stem}.npy", lab.astype(np.int32))
        counts[tag] = counts.get(tag, 0) + 1

    with open(out / "MANIFEST.json", "w") as f:
        json.dump({"n": args.n, "size": size, "seed": args.seed,
                   "classes": counts,
                   "note": "synthetic mixed-compressibility corpus; "
                           "ground-truth partitions in labels/"}, f, indent=1)
    print(f"wrote {args.n} images to {out} ({counts})")


if __name__ == "__main__":
    main()
