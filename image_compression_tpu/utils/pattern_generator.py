"""Synthetic images with known compressibility classes.

Numpy re-design of the reference's orphaned pattern generator
(pattern_generator.cpp:11-220). The five classes span the compressibility
spectrum and calibrate/validate the PNG size estimator: tile repetition,
monochrome, low-variance noise, low-frequency noise, row copies (plus
uniform noise as the incompressible extreme).
"""

from __future__ import annotations

import numpy as np


def generate_repetition_pattern(width: int, height: int, alpha: bool,
                                rng: np.random.Generator,
                                tile: int = 8) -> np.ndarray:
    c = 4 if alpha else 3
    small = rng.integers(0, 256, (tile, tile, c), np.uint8)
    reps = (-(-height // tile), -(-width // tile), 1)
    return np.tile(small, reps)[:height, :width]


def generate_monochrome_region(width: int, height: int, alpha: bool,
                               rng: np.random.Generator) -> np.ndarray:
    c = 4 if alpha else 3
    color = rng.integers(0, 256, (c,), np.uint8)
    return np.broadcast_to(color, (height, width, c)).copy()


def generate_low_variance_noise(width: int, height: int, alpha: bool,
                                rng: np.random.Generator) -> np.ndarray:
    c = 4 if alpha else 3
    mean = rng.integers(50, 201, (c,))
    sigma = rng.integers(2, 9, (c,))
    img = rng.normal(mean, sigma, (height, width, c))
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_low_frequency_noise(width: int, height: int, alpha: bool,
                                 rng: np.random.Generator,
                                 seed_size: int = 32) -> np.ndarray:
    c = 4 if alpha else 3
    mean = rng.integers(50, 201, (c,))
    sigma = rng.integers(2, 21, (c,))
    seed = np.clip(rng.normal(mean, sigma, (seed_size, seed_size, c)), 0, 255)
    # bilinear upscale (reference uses cubic; low-frequency character is what
    # matters for the estimator tests)
    ys = np.linspace(0, seed_size - 1, height)
    xs = np.linspace(0, seed_size - 1, width)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, seed_size - 1)
    x1 = np.minimum(x0 + 1, seed_size - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = ((1 - wy) * (1 - wx) * seed[y0][:, x0]
           + (1 - wy) * wx * seed[y0][:, x1]
           + wy * (1 - wx) * seed[y1][:, x0]
           + wy * wx * seed[y1][:, x1])
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_random_row_copies(width: int, height: int, alpha: bool,
                               rng: np.random.Generator) -> np.ndarray:
    c = 4 if alpha else 3
    row = rng.integers(0, 256, (1, width, c), np.uint8)
    return np.repeat(row, height, axis=0)


def generate_random_noise(width: int, height: int, alpha: bool,
                          rng: np.random.Generator) -> np.ndarray:
    c = 4 if alpha else 3
    return rng.integers(0, 256, (height, width, c), np.uint8)


GENERATORS = {
    "repetition": generate_repetition_pattern,
    "monochrome": generate_monochrome_region,
    "low_variance": generate_low_variance_noise,
    "low_frequency": generate_low_frequency_noise,
    "row_copies": generate_random_row_copies,
    "noise": generate_random_noise,
}


def create_random_patterns(cache_dir, width: int = 1024, height: int = 1024,
                           per_class: int = 100, seed: int = 0) -> int:
    """Populate cache_dir/random_patterns with the five compressibility
    classes x {alpha, no-alpha} (pattern_generator.cpp:11-40: 100 images per
    class at 1024^2, skipping ones that already exist). Returns the number of
    images written."""
    import pathlib

    from image_compression_tpu.io.image_io import write_image

    out_dir = pathlib.Path(cache_dir) / "random_patterns"
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    classes = ["repetition", "monochrome", "low_variance", "low_frequency",
               "row_copies"]
    idx = 0
    written = 0
    for name in classes:
        for alpha in (True, False):
            for _ in range(per_class):
                path = out_dir / f"{idx}.png"
                if not path.exists():
                    write_image(path, GENERATORS[name](width, height, alpha,
                                                       rng))
                    written += 1
                idx += 1
    return written


def generate_random_partition(height: int, width: int, num_segments: int,
                              seed: int = 0) -> np.ndarray:
    """Multi-seed BFS region growth -> connected random segmentation
    (pattern_generator.cpp:222-288), vectorized as iterative masked dilation
    with random per-round priority so regions interleave."""
    rng = np.random.default_rng(seed)
    labels = np.full((height, width), -1, np.int64)
    ys = rng.integers(0, height, num_segments)
    xs = rng.integers(0, width, num_segments)
    labels[ys, xs] = np.arange(num_segments)

    while (labels < 0).any():
        # each unfilled cell adopts a random filled 4-neighbor
        padded = np.pad(labels, 1, constant_values=-1)
        neigh = np.stack([padded[:-2, 1:-1], padded[2:, 1:-1],
                          padded[1:-1, :-2], padded[1:-1, 2:]])
        prio = rng.random(neigh.shape)
        prio[neigh < 0] = -1.0
        pick = np.take_along_axis(
            neigh, prio.argmax(axis=0)[None], axis=0)[0]
        grow = (labels < 0) & (pick >= 0)
        if not grow.any():
            # unreachable cells (can't happen on a 4-connected grid with >=1 seed)
            break
        labels[grow] = pick[grow]
    return labels
