"""Image load/save and recursive dataset scanning.

Equivalent surface to the reference's L2 layer (image_loader.cpp:14-43,
image_writer.cpp:4-8) without OpenCV: PIL decodes/encodes PNG on the host.
Arrays are RGB(A) uint8 HWC (the reference holds BGR(A) cv::Mats in memory but
PNG files themselves are RGB(A); channel order on disk is identical).

A native C++ zlib PNG codec (native/pngio.cpp) is used when built — it is the
throughput path for slice writing; PIL is the always-available fallback.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np
from PIL import Image


def find_image_files_recursively(root: str | pathlib.Path,
                                 extension: str = "png") -> list[pathlib.Path]:
    """Recursive extension-filtered scan (image_loader.cpp:14-32).

    Matching is case-insensitive on the suffix; results sorted for
    determinism (the reference relies on filesystem order).
    """
    suffix = "." + extension.lower().lstrip(".")
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if name.lower().endswith(suffix):
                out.append(pathlib.Path(dirpath) / name)
    out.sort()
    return out


def _la_to_rgba(arr: np.ndarray) -> np.ndarray:
    """2-channel gray+alpha -> RGBA (luma replicated), dtype preserved."""
    h, w = arr.shape[:2]
    out = np.empty((h, w, 4), arr.dtype)
    out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr[:, :, 0]
    out[:, :, 3] = arr[:, :, 1]
    return out


def load_image(path: str | pathlib.Path) -> np.ndarray:
    """Decode an image to uint8/uint16 HWC, keeping channel count and depth.

    Reference uses cv::imread(IMREAD_UNCHANGED) (image_loader.cpp:34-43):
    grayscale stays 1-channel, RGB 3, RGBA 4, and 16-bit stays 16-bit.
    PNGs decode through the native zlib codec when built (8- and 16-bit,
    color types 0/2/4/6), with a pure-Python PNG fallback for 16-bit and PIL
    for everything else (palette, interlaced, non-PNG formats). Gray+alpha
    decodes are converted to RGBA (the downstream contract is 1/3/4
    channels, matching to_f32c3_01_or_throw, compress.cpp:10-35).
    """
    path = pathlib.Path(path)
    return decode_image_bytes(path.read_bytes(),
                              is_png=path.suffix.lower() == ".png")


def decode_image_bytes(data: bytes, is_png: bool | None = None) -> np.ndarray:
    """Decode image bytes with load_image's exact fallback chain (the pack
    container hands slice PNGs over as in-memory bytes, io/pack.py)."""
    if is_png is None:
        is_png = data[:8] == b"\x89PNG\r\n\x1a\n"
    if is_png:
        from image_compression_tpu.io import native
        if native.available():
            try:
                arr = native.decode_png(data)
                if arr.shape[2] == 2:
                    arr = _la_to_rgba(arr)
                return arr
            except ValueError:
                pass  # unsupported PNG flavor: fall through
        from image_compression_tpu.io import pypng
        arr = pypng.try_decode(data)
        if arr is not None:
            if arr.ndim == 3 and arr.shape[2] == 2:
                arr = _la_to_rgba(arr)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return np.ascontiguousarray(arr)
    import io as _io
    with Image.open(_io.BytesIO(data)) as im:
        if im.mode in ("RGB", "RGBA", "L"):
            arr = np.asarray(im)
        elif im.mode == "LA":
            arr = np.asarray(im.convert("RGBA"))
        elif im.mode in ("P", "1"):
            converted = im.convert("RGBA" if "transparency" in im.info else "RGB")
            arr = np.asarray(converted)
        elif im.mode in ("I;16", "I;16B", "I;16L"):
            arr = np.asarray(im).astype(np.uint16)
        else:
            arr = np.asarray(im.convert("RGB"))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return np.ascontiguousarray(arr)


def write_image(path: str | pathlib.Path, image_hwc_u8: np.ndarray,
                compression_level: int = 4) -> bool:
    """Encode PNG at the configured zlib level (image_writer.cpp:4-8 writes
    with IMWRITE_PNG_COMPRESSION=4). Forces a .png suffix like the reference
    (write_image forces IMAGE_FORMAT). uint16 inputs write 16-bit PNGs
    (cv::imwrite keeps the Mat depth; the reference loads IMREAD_UNCHANGED)."""
    path = pathlib.Path(path).with_suffix(".png")
    arr = np.ascontiguousarray(image_hwc_u8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.dtype == np.uint16:
        from image_compression_tpu.io import native, pypng
        try:
            if native.available():
                data = native.encode_png(arr, compression_level)
            else:
                data = pypng.encode(arr, compression_level)
            path.write_bytes(data)
            return True
        except OSError:
            return False
    try:
        Image.fromarray(arr).save(path, format="PNG",
                                  compress_level=compression_level)
        return True
    except OSError:
        return False


def encode_image_bytes(image_hwc_u8: np.ndarray,
                       compression_level: int = 4) -> bytes:
    """PNG bytes for an image (the in-memory form of write_image; the pack
    container stores these verbatim, io/pack.py)."""
    arr = np.ascontiguousarray(image_hwc_u8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    from image_compression_tpu.io import native
    if native.available():
        return native.encode_png(arr, compression_level)
    if arr.dtype == np.uint16:
        from image_compression_tpu.io import pypng
        return pypng.encode(arr, compression_level)
    import io as _io
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG",
                              compress_level=compression_level)
    return buf.getvalue()


def to_float01_rgb(image_hwc_u8: np.ndarray) -> np.ndarray:
    """uint8/uint16 HWC (1/3/4ch) -> float32 RGB in [0, 1].

    Mirrors to_f32c3_01_or_throw (compress.cpp:10-35, EdgeDataset.h:58-83):
    grayscale replicated to 3 channels, alpha dropped, 8-bit scaled by 1/255
    (16-bit by 1/65535).
    """
    arr = image_hwc_u8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    if c == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif c == 4:
        arr = arr[:, :, :3]
    elif c != 3:
        raise ValueError(f"unsupported channel count: {c}")
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    if arr.dtype == np.float32:
        return arr
    raise ValueError(f"unsupported dtype: {arr.dtype}")


def ensure_rgba(image_hwc_u8: np.ndarray) -> np.ndarray:
    """1/3/4-channel uint8/uint16 -> RGBA with opaque alpha
    (reassemble.cpp:15-28); depth is preserved."""
    arr = image_hwc_u8
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 4:
        return arr
    out = np.empty((h, w, 4), arr.dtype)
    if c in (1, 3):
        out[:, :, :3] = arr
    else:
        raise ValueError(f"unsupported channel count: {c}")
    out[:, :, 3] = np.iinfo(arr.dtype).max if arr.dtype != np.float32 else 1.0
    return out
