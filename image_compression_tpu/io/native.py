"""ctypes bindings for the native host runtime (native/pngio.cpp).

Provides the throughput path for PNG encode/decode and parallel slice
writing; every entry point has a pure-Python fallback (io/image_io.py,
io/slicer.py), so the framework works without the native build. Build with
`make -C native`.
"""

from __future__ import annotations

import ctypes
import pathlib

import numpy as np

_LIB_PATH = (pathlib.Path(__file__).resolve().parent.parent.parent
             / "native" / "libpngio.so")
_lib = None
_build_attempted = False


def _try_build() -> None:
    """One-time best-effort `make -C native`: the .so is untracked, so a
    fresh checkout silently fell back to the ~4x-slower pure-Python encoder
    until someone remembered to build (this cost one benchmark run its
    host-side headline). Failures are ignored — every caller has a
    fallback.

    Concurrent-build safety (pytest -n auto on a fresh checkout): an
    exclusive flock on a sidecar lockfile serializes the make invocations,
    and the Makefile links to a temp name and mv's it into place, so a
    racing process can never CDLL a partially written .so."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    import subprocess
    try:
        import fcntl
        with open(_LIB_PATH.parent / ".build.lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if not _LIB_PATH.exists():
                subprocess.run(["make", "-C", str(_LIB_PATH.parent)],
                               capture_output=True, timeout=120, check=False)
    except (OSError, subprocess.TimeoutExpired):
        pass


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        # unreadable/corrupt .so (e.g. a build interrupted before the
        # atomic rename existed): keep the documented pure-Python fallback
        return None
    lib.pngio_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t)]
    lib.pngio_encode.restype = ctypes.c_int
    lib.pngio_encode16.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t)]
    lib.pngio_encode16.restype = ctypes.c_int
    lib.pngio_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.pngio_decode.restype = ctypes.c_int
    lib.pngio_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.pngio_write_slices.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int]
    lib.pngio_write_slices.restype = ctypes.c_int
    lib.pngio_write_slices_pack.argtypes = lib.pngio_write_slices.argtypes
    lib.pngio_write_slices_pack.restype = ctypes.c_int
    lib.pngio_labels_from_conn.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
    lib.pngio_labels_from_conn.restype = ctypes.c_int
    lib.pngio_write_slices_conn.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pngio_write_slices_conn.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def encode_png(image_hwc: np.ndarray, level: int = 4) -> bytes:
    """uint8 or uint16 HWC/HW -> PNG bytes (16-bit inputs write 16-bit PNGs)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    is16 = np.asarray(image_hwc).dtype == np.uint16
    arr = np.ascontiguousarray(image_hwc, np.uint16 if is16 else np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    out_len = ctypes.c_size_t()
    if is16:
        rc = lib.pngio_encode16(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w, c,
            level, ctypes.byref(out), ctypes.byref(out_len))
    else:
        rc = lib.pngio_encode(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
            level, ctypes.byref(out), ctypes.byref(out_len))
    if rc != 0:
        raise RuntimeError(f"pngio_encode failed: {rc}")
    try:
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.pngio_free(out)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HWC array: uint8 for 8-bit files, uint16 for 16-bit."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    depth = ctypes.c_int()
    rc = lib.pngio_decode(buf, len(data), None, ctypes.byref(h),
                          ctypes.byref(w), ctypes.byref(c),
                          ctypes.byref(depth))
    if rc != 0:
        raise ValueError(f"pngio_decode failed (unsupported PNG): {rc}")
    dtype = np.uint16 if depth.value == 16 else np.uint8
    out = np.empty((h.value, w.value, c.value), dtype)
    rc = lib.pngio_decode(buf, len(data),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
                          ctypes.byref(depth))
    if rc != 0:
        raise ValueError(f"pngio_decode failed: {rc}")
    return out


def write_slices_native(image_rgba_u8: np.ndarray, labels_hw: np.ndarray,
                        out_path: str, level: int = 4,
                        n_threads: int = 0, pack: bool = False) -> int:
    """Parallel native slicer: returns number of slices written. pack=True
    writes ONE "SLPK" container file at out_path instead of a directory of
    slice PNGs + metadata.bin (identical bytes inside; io/pack.py)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    img = np.ascontiguousarray(image_rgba_u8, np.uint8)
    labels = np.ascontiguousarray(labels_hw, np.int32)
    h, w = labels.shape
    assert img.shape == (h, w, 4), img.shape
    fn = lib.pngio_write_slices_pack if pack else lib.pngio_write_slices
    rc = fn(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        h, w, str(out_path).encode(), level, n_threads)
    if rc < 0:
        raise RuntimeError("pngio_write_slices failed")
    return rc


def _conn_buffers(hbits: np.ndarray, vbits: np.ndarray,
                  height: int, width: int):
    stride = -(-width // 8)
    hb = np.ascontiguousarray(hbits, np.uint8)
    vb = np.ascontiguousarray(vbits, np.uint8)
    assert hb.shape == (height, stride), (hb.shape, height, stride)
    assert vb.shape == (height, stride), (vb.shape, height, stride)
    return hb, vb


def labels_from_conn_native(hbits: np.ndarray, vbits: np.ndarray,
                            height: int, width: int) -> np.ndarray:
    """Min-root union-find label reconstruction from bit-packed connectivity
    (native/pngio.cpp). Returns int32 [H, W] minlabel ids — bit-identical to
    the device solver's labels (ops/labels_wire.py docstring)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    hb, vb = _conn_buffers(hbits, vbits, height, width)
    out = np.empty((height, width), np.int32)
    rc = lib.pngio_labels_from_conn(
        hb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        height, width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError("pngio_labels_from_conn failed")
    return out


def write_slices_conn_native(image_rgba_u8: np.ndarray, hbits: np.ndarray,
                             vbits: np.ndarray, out_path: str,
                             level: int = 4, n_threads: int = 0,
                             pack: bool = False) -> int:
    """Slice directly from packed connectivity planes: native union-find
    label reconstruction + the parallel slicer in one call (the full host
    half of compress after a 2-bit/pixel fetch)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    img = np.ascontiguousarray(image_rgba_u8, np.uint8)
    h, w = img.shape[:2]
    assert img.shape == (h, w, 4), img.shape
    hb, vb = _conn_buffers(hbits, vbits, h, w)
    rc = lib.pngio_write_slices_conn(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, str(out_path).encode(), level, n_threads, 1 if pack else 0)
    if rc < 0:
        raise RuntimeError("pngio_write_slices_conn failed")
    return rc
