"""Build a real-image training corpus in the zero-egress environment.

The reference trains on an ImageNet-scale directory of 256x256 PNGs
(configuration.h:6, image_converter.cpp:9-11). This environment has no
network, so the corpus is built from real images shipped inside installed
packages (sklearn's photos, matplotlib's sample data, dm_control's
photographic skyboxes/pitch/humanoid textures, labmaze's wall/floor/sky
textures, gymnasium-robotics' material photos, pygame's examples), expanded
by multi-scale random crops with flips/rotations, plus synthetic
compressibility patterns (utils/pattern_generator.py).

Train/val hygiene (round-3 fix): the split is BY SOURCE IMAGE — every
source photo is assigned to exactly one of train/val before any cropping,
so no val crop shares a single source pixel with any train crop (round 2
drew both sides from the same five photographs, which leaked). The split is
deterministic (seeded shuffle of sorted source names) and recorded in a
MANIFEST.json next to each output directory.

Usage:
  python benchmarks/make_corpus.py TRAIN_DIR VAL_DIR \
      [--n-train 2000] [--n-val 256] [--n-syn 400] [--val-frac 0.25]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sysconfig

import numpy as np
from PIL import Image

SIZE = 256


def _site_packages() -> pathlib.Path:
    return pathlib.Path(sysconfig.get_paths()["purelib"])


def discover_sources() -> dict[str, np.ndarray]:
    """All usable source images, keyed by a stable name. Only real image
    content (photos/textures/renders) >= 256px on both sides; diagrams,
    charts, and text-heavy doc screenshots are excluded."""
    sp = _site_packages()
    sources: dict[str, np.ndarray] = {}

    def add(name: str, path: pathlib.Path):
        try:
            with Image.open(path) as im:
                if min(im.size) < SIZE:
                    return
                arr = np.asarray(im.convert("RGB"), np.uint8)
        except Exception:
            return
        sources[name] = arr

    try:
        from sklearn.datasets import load_sample_images
        data = load_sample_images()
        for fname, img in zip(data.filenames, data.images):
            img = np.asarray(img, np.uint8)
            if min(img.shape[:2]) >= SIZE:
                sources[f"sklearn_{pathlib.Path(fname).stem}"] = img
    except Exception:
        pass

    try:
        import matplotlib
        root = pathlib.Path(matplotlib.get_data_path()) / "sample_data"
        for name in ("grace_hopper.jpg", "logo2.png",
                     "Minduka_Present_Blue_Pack.png"):
            add(f"mpl_{pathlib.Path(name).stem}", root / name)
    except Exception:
        pass

    # photographic / texture assets inside installed simulation packages
    patterns = [
        ("dmc", "dm_control/locomotion/soccer/assets/pitch/*.png"),
        ("dmc", "dm_control/locomotion/soccer/assets/humanoid/*.png"),
        ("dmc", "dm_control/locomotion/arenas/assets/outdoor_natural/*.png"),
        ("dmc", "dm_control/locomotion/walkers/assets/jumping_ball/*.png"),
        ("labmaze", "labmaze/assets/*/*.png"),
        ("gymrob", "gymnasium_robotics/envs/assets/**/textures/*.png"),
        ("gymrob",
         "gymnasium_robotics/envs/assets/adroit_hand/resources/textures/*.png"),
        ("pygame", "pygame/examples/data/*.png"),
    ]
    for prefix, pat in patterns:
        for p in sorted(sp.glob(pat)):
            add(f"{prefix}_{p.parent.name}_{p.stem}", p)

    if not sources:
        raise RuntimeError("no source images found")
    return sources


def family(name: str) -> str:
    """Split group of a source: recolors/renumberings of one texture are the
    SAME family, so near-duplicates can never straddle the split.

    - dm_control humanoid jerseys (B_01..R_11) are one shirt texture with
      different numbers/colors -> one family; pitch variants likewise.
    - labmaze styles recolor each texture (wall_yellow_d/wall_purple_d ...):
      everything in one style/sky directory is one family.
    - elsewhere, strip trailing digits (marble1/marble2 -> marble).
    """
    parts = name.split("_")
    if name.startswith("dmc_humanoid_"):
        return "dmc_humanoid"
    if name.startswith("dmc_pitch_"):
        return "dmc_pitch"
    if name.startswith("labmaze_"):
        return f"labmaze_{parts[1]}_{parts[2]}"   # style_NN / sky_NN dir
    return name.rstrip("0123456789")


def split_sources(names: list[str], val_frac: float,
                  seed: int) -> tuple[list[str], list[str]]:
    """Deterministic by-family split: no family appears on both sides."""
    names = sorted(names)
    fams = sorted({family(n) for n in names})
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(fams))
    n_val = max(1, int(round(val_frac * len(fams))))
    val_fams = {fams[i] for i in order[:n_val].tolist()}
    train = [n for n in names if family(n) not in val_fams]
    val = [n for n in names if family(n) in val_fams]
    return train, val


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


def write_crops(out: pathlib.Path, names: list[str],
                sources: dict[str, np.ndarray], n: int, tag: str,
                rng: np.random.Generator) -> None:
    for i in range(n):
        img = random_crop_256(sources[names[i % len(names)]], rng)
        Image.fromarray(img).save(out / f"{tag}_{i:05d}.png")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("train_dir")
    ap.add_argument("val_dir")
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-val", type=int, default=256)
    ap.add_argument("--n-syn", type=int, default=400)
    ap.add_argument("--val-frac", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    sources = discover_sources()
    train_names, val_names = split_sources(
        list(sources), args.val_frac, args.seed)
    print(f"{len(sources)} sources: {len(train_names)} train / "
          f"{len(val_names)} val (held out entirely)")

    for out_dir, names, n, tag, crop_seed in (
            (args.train_dir, train_names, args.n_train, "real", 1),
            (args.val_dir, val_names, args.n_val, "val", 2)):
        out = pathlib.Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(args.seed * 1000 + crop_seed)
        write_crops(out, names, sources, n, tag, rng)
        with open(out / "MANIFEST.json", "w") as f:
            json.dump({"sources": names, "n_crops": n,
                       "split": "by-source (no source shared with the "
                                "other side)",
                       "seed": args.seed}, f, indent=1)

    # synthetic compressibility patterns: train side only
    from image_compression_tpu.utils.pattern_generator import (
        generate_low_frequency_noise, generate_low_variance_noise,
        generate_monochrome_region, generate_random_row_copies,
        generate_repetition_pattern)
    gens = [generate_repetition_pattern, generate_monochrome_region,
            generate_low_variance_noise, generate_low_frequency_noise,
            generate_random_row_copies]
    rng = np.random.default_rng(args.seed * 1000 + 3)
    out = pathlib.Path(args.train_dir)
    for i in range(args.n_syn):
        gen = gens[i % len(gens)]
        img = gen(SIZE, SIZE, False, rng)
        Image.fromarray(img[..., :3]).save(out / f"syn_{i:05d}.png")

    print(f"wrote {args.n_train + args.n_syn} train / {args.n_val} val")


if __name__ == "__main__":
    main()
