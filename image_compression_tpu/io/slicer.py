"""Slice a labeled image into per-segment transparent PNGs + metadata.

Host-side equivalent of the reference slicer (image_slicer.cpp:15-130), with
the per-label O(K*H*W) CPU bbox scans replaced by one vectorized pass
(scipy.ndimage.find_objects) and slice encoding fanned out over a thread pool
(reference uses one std::async task per label, image_slicer.cpp:98-124).

On-device segment statistics (counts/bboxes) live in ops/segment_stats.py;
this module is the disk boundary only.
"""

from __future__ import annotations

import concurrent.futures
import os
import pathlib

import numpy as np
from scipy import ndimage

from image_compression_tpu.io.image_io import ensure_rgba, write_image
from image_compression_tpu.io.metadata import SliceMetadata, write_metadata_binary


def compute_bounding_boxes(labels_hw: np.ndarray) -> dict[int, tuple[int, int, int, int]]:
    """Bounding boxes (x, y, w, h) for every label present in the map.

    Replaces the reference's per-label full-image scan
    (image_slicer.cpp:15-41) with a single labeled pass.
    """
    labels_hw = np.ascontiguousarray(labels_hw)
    lab_min = int(labels_hw.min())
    shifted = labels_hw - lab_min + 1  # find_objects wants positive labels
    objects = ndimage.find_objects(shifted)
    boxes: dict[int, tuple[int, int, int, int]] = {}
    for idx, sl in enumerate(objects):
        if sl is None:
            continue
        ys, xs = sl
        boxes[idx + lab_min] = (
            int(xs.start), int(ys.start),
            int(xs.stop - xs.start), int(ys.stop - ys.start),
        )
    return boxes


def slice_image(image_rgba: np.ndarray, labels_hw: np.ndarray, label: int,
                box: tuple[int, int, int, int]) -> np.ndarray:
    """Extract one segment as an RGBA crop with transparent background
    (image_slicer.cpp:48-74).

    A segment that fills its whole bbox with opaque source pixels is
    returned as RGB instead: its alpha plane carries no information, and
    reassembly composites RGB slices identically (ensure_rgba makes them
    fully opaque; the alpha>0 mask was all-true for such slices anyway).
    The single-slice fallback's full-canvas slice always takes this path.
    Matches the native writer (native/pngio.cpp write_slices_impl)."""
    x, y, w, h = box
    crop = image_rgba[y:y + h, x:x + w]
    mask = labels_hw[y:y + h, x:x + w] == label
    opaque = np.iinfo(image_rgba.dtype).max
    if mask.all() and (crop[:, :, 3] == opaque).all():
        return crop[:, :, :3].copy()
    out = np.zeros((h, w, 4), image_rgba.dtype)
    out[mask] = crop[mask]
    return out


def write_slices(image_hwc_u8: np.ndarray, labels_hw: np.ndarray,
                 output_path: str | pathlib.Path,
                 file_directory_name: str | pathlib.Path,
                 image_format: str = "png", compression_level: int = 4,
                 max_workers: int | None = None,
                 use_native: bool | None = None,
                 container: str = "files") -> bool:
    """Write one PNG per segment plus metadata.bin (image_slicer.cpp:81-130).

    container="files" (the reference layout): files land in
    output_path/file_directory_name/slice_<label>.png; metadata.bin is
    byte-compatible with the reference. container="pack" writes the same
    bytes into ONE file output_path/<file_directory_name>.pack (io/pack.py)
    — one file create instead of K+1; `reassemble` reads both. Uses the
    native C++ slicer+encoder (native/pngio.cpp) when built, unless
    use_native=False.

    Only "png" is a valid image_format: the lossless-round-trip contract
    requires it (the reference's write_image also forces IMAGE_FORMAT="png",
    image_writer.cpp:4-8 + configuration.h:10). Anything else raises rather
    than silently writing files whose names mismatch their metadata.
    """
    if image_format != "png":
        raise ValueError(
            f"write_slices supports only image_format='png' (lossless "
            f"round-trip contract), got {image_format!r}")
    if container not in ("files", "pack"):
        raise ValueError(f"unknown container: {container!r}")
    pack = container == "pack"
    if pack:
        out_target = (pathlib.Path(output_path)
                      / f"{file_directory_name}.pack")
        out_target.parent.mkdir(parents=True, exist_ok=True)
    else:
        out_target = pathlib.Path(output_path) / file_directory_name
        out_target.mkdir(parents=True, exist_ok=True)

    image_rgba = ensure_rgba(np.asarray(image_hwc_u8))
    labels_hw = np.asarray(labels_hw)
    h_img, w_img = labels_hw.shape

    if use_native is not False and image_rgba.dtype == np.uint8:
        from image_compression_tpu.io import native
        if native.available() and labels_hw.min() >= 0 and \
                labels_hw.max() < np.iinfo(np.int32).max:
            n = native.write_slices_native(image_rgba, labels_hw, out_target,
                                           compression_level,
                                           max_workers or 0, pack=pack)
            return n >= 0
        if use_native:
            raise RuntimeError("native slicer requested but unavailable")

    boxes = compute_bounding_boxes(labels_hw)

    def _write_one(label: int) -> tuple[bool, SliceMetadata, bytes | None]:
        box = boxes[label]
        piece = slice_image(image_rgba, labels_hw, label, box)
        filename = f"slice_{label}.{image_format}"
        meta = SliceMetadata(label=label, filename=filename,
                             x=box[0], y=box[1],
                             width=box[2], height=box[3])
        if pack:
            from image_compression_tpu.io.image_io import encode_image_bytes
            return True, meta, encode_image_bytes(piece, compression_level)
        return write_image(out_target / filename, piece,
                           compression_level), meta, None

    workers = max_workers or min(32, (os.cpu_count() or 1))
    success = True
    metadata: list[SliceMetadata] = []
    blobs: list[bytes] = []
    with concurrent.futures.ThreadPoolExecutor(workers) as pool:
        for ok, meta, blob in pool.map(_write_one, sorted(boxes)):
            success = success and ok
            metadata.append(meta)
            blobs.append(blob)

    if pack:
        from image_compression_tpu.io.pack import write_pack
        write_pack(out_target, metadata, blobs, w_img, h_img)
    else:
        write_metadata_binary(metadata, out_target / "metadata.bin",
                              w_img, h_img)
    return success


def write_slices_from_conn(image_hwc_u8: np.ndarray, hbits: np.ndarray,
                           vbits: np.ndarray,
                           output_path: str | pathlib.Path,
                           file_directory_name: str | pathlib.Path,
                           image_format: str = "png",
                           compression_level: int = 4,
                           max_workers: int | None = None,
                           use_native: bool | None = None,
                           container: str = "files") -> bool:
    """write_slices from bit-packed connectivity planes instead of a label
    map (ops/labels_wire.py wire format — 2 bits/pixel over the device->host
    boundary instead of 16). The native path reconstructs labels and slices
    in one call; the fallback reconstructs via scipy connected components.
    Output bytes are identical to write_slices on the solver's labels
    (min-root union-find == minlabel contract; tests/test_labels_wire.py)."""
    if image_format != "png":
        raise ValueError("write_slices_from_conn supports only 'png'")
    if container not in ("files", "pack"):
        raise ValueError(f"unknown container: {container!r}")
    pack = container == "pack"
    image_rgba = ensure_rgba(np.asarray(image_hwc_u8))
    h_img, w_img = image_rgba.shape[:2]

    if use_native is not False and image_rgba.dtype == np.uint8:
        from image_compression_tpu.io import native
        if native.available():
            out_target = pathlib.Path(output_path) / (
                f"{file_directory_name}.pack" if pack
                else str(file_directory_name))
            if pack:
                out_target.parent.mkdir(parents=True, exist_ok=True)
            else:
                out_target.mkdir(parents=True, exist_ok=True)
            n = native.write_slices_conn_native(
                image_rgba, hbits, vbits, out_target, compression_level,
                max_workers or 0, pack=pack)
            return n >= 0
        if use_native:
            raise RuntimeError("native slicer requested but unavailable")

    from image_compression_tpu.ops.labels_wire import labels_from_connectivity
    labels = labels_from_connectivity(np.asarray(hbits), np.asarray(vbits),
                                      h_img, w_img)
    return write_slices(image_hwc_u8, labels.astype(np.int64), output_path,
                        file_directory_name, image_format, compression_level,
                        max_workers, use_native, container)
