"""Build a real-image training corpus in the zero-egress environment.

The reference trains on an ImageNet-scale directory of 256x256 PNGs
(configuration.h:6, image_converter.cpp:9-11). This environment has no
network, so the corpus is built from every real photograph shipped with the
installed packages (sklearn's china/flower, matplotlib's grace_hopper and
logos) expanded by multi-scale random crops with flips/rotations, plus the
synthetic compressibility patterns (utils/pattern_generator.py). All images
are 256x256 RGB PNGs, matching the converter output the reference trains on.

Usage: python benchmarks/make_corpus.py OUT_DIR [--n-real 1600] [--n-syn 400]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np
from PIL import Image

SIZE = 256


def source_photos() -> list[np.ndarray]:
    photos = []
    try:
        from sklearn.datasets import load_sample_images
        photos += [np.asarray(im, np.uint8)
                   for im in load_sample_images().images]
    except Exception:
        pass
    try:
        import matplotlib
        root = pathlib.Path(matplotlib.get_data_path()) / "sample_data"
        for name in ("grace_hopper.jpg", "logo2.png",
                     "Minduka_Present_Blue_Pack.png"):
            p = root / name
            if p.exists():
                with Image.open(p) as im:
                    photos.append(np.asarray(im.convert("RGB"), np.uint8))
    except Exception:
        pass
    photos = [p for p in photos if min(p.shape[:2]) >= SIZE]
    if not photos:
        raise RuntimeError("no source photos found")
    return photos


def random_crop_256(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    h, w = img.shape[:2]
    side = int(rng.integers(SIZE, min(h, w) + 1)) if min(h, w) > SIZE else SIZE
    y = int(rng.integers(0, h - side + 1))
    x = int(rng.integers(0, w - side + 1))
    crop = img[y:y + side, x:x + side]
    if side != SIZE:
        crop = np.asarray(Image.fromarray(crop).resize(
            (SIZE, SIZE), Image.BICUBIC))
    k = int(rng.integers(0, 4))
    crop = np.rot90(crop, k)
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    return np.ascontiguousarray(crop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-real", type=int, default=1600)
    ap.add_argument("--n-syn", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    photos = source_photos()
    print(f"{len(photos)} source photos")

    for i in range(args.n_real):
        img = random_crop_256(photos[i % len(photos)], rng)
        Image.fromarray(img).save(out / f"real_{i:05d}.png")

    from image_compression_tpu.utils.pattern_generator import (
        generate_low_frequency_noise, generate_low_variance_noise,
        generate_monochrome_region, generate_random_row_copies,
        generate_repetition_pattern)
    gens = [generate_repetition_pattern, generate_monochrome_region,
            generate_low_variance_noise, generate_low_frequency_noise,
            generate_random_row_copies]
    for i in range(args.n_syn):
        gen = gens[i % len(gens)]
        img = gen(SIZE, SIZE, False, rng)
        Image.fromarray(img[..., :3]).save(out / f"syn_{i:05d}.png")

    print(f"wrote {args.n_real + args.n_syn} images to {out}")


if __name__ == "__main__":
    main()
