"""Dataset prep: batch-convert images to the training format.

Equivalent of the `image_converter` binary (image_converter.cpp:16-45): scan
for SOURCE_FORMAT images, resize each to a fixed square, re-encode as PNG in
place of the source path (suffix swapped). Host thread pool (the reference
uses <=8 threads over an atomic work index).
"""

from __future__ import annotations

import concurrent.futures
import os
import pathlib

import numpy as np
from PIL import Image

from image_compression_tpu.io.image_io import find_image_files_recursively


def convert_dataset(dataset_dir: str | pathlib.Path,
                    source_format: str = "jpeg", width: int = 256,
                    height: int = 256, compression_level: int = 4,
                    max_workers: int | None = None) -> int:
    """Returns the number of images converted. Defaults mirror
    image_converter.cpp:9-11 (jpeg -> 256x256 png)."""
    paths = find_image_files_recursively(dataset_dir, source_format)

    def convert(path: pathlib.Path) -> bool:
        try:
            with Image.open(path) as im:
                im = im.convert("RGB").resize((width, height),
                                              Image.BILINEAR)
                im.save(path.with_suffix(".png"), format="PNG",
                        compress_level=compression_level)
            return True
        except OSError as e:
            print(f"failed to convert {path}: {e}")
            return False

    workers = max_workers or min(8, os.cpu_count() or 1)
    with concurrent.futures.ThreadPoolExecutor(workers) as pool:
        results = list(pool.map(convert, paths))
    return int(np.sum(results))
