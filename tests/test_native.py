"""Native C++ runtime (native/pngio.cpp): PNG codec round trips (against PIL
as oracle), parallel slicer parity with the Python path, metadata byte
compatibility."""

import io

import numpy as np
import pytest
from PIL import Image

from image_compression_tpu.io import native
from image_compression_tpu.io.image_io import ensure_rgba
from image_compression_tpu.io.metadata import read_metadata_binary
from image_compression_tpu.io.reassemble import reassemble_array
from image_compression_tpu.io.slicer import write_slices
from image_compression_tpu.utils.random_partition import random_rect_partition

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built (make -C native)")


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_encode_pil_decodes(rng, channels):
    img = rng.integers(0, 256, (23, 31, channels), np.uint8)
    data = native.encode_png(img, level=4)
    with Image.open(io.BytesIO(data)) as im:
        decoded = np.asarray(im)
    if decoded.ndim == 2:
        decoded = decoded[:, :, None]
    np.testing.assert_array_equal(decoded, img)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_decode_pil_encodes(rng, channels):
    img = rng.integers(0, 256, (17, 9, channels), np.uint8)
    buf = io.BytesIO()
    arr = img[:, :, 0] if channels == 1 else img
    Image.fromarray(arr).save(buf, format="PNG")
    decoded = native.decode_png(buf.getvalue())
    np.testing.assert_array_equal(decoded, img)


def test_codec_roundtrip(rng):
    img = rng.integers(0, 256, (64, 64, 4), np.uint8)
    np.testing.assert_array_equal(native.decode_png(native.encode_png(img)),
                                  img)


def test_native_slicer_lossless(tmp_path, rng):
    img = rng.integers(0, 256, (48, 56, 3), np.uint8)
    labels = random_rect_partition(48, 56, min_h=8, min_w=8,
                                   min_rect_count=4, seed=5)
    n = native.write_slices_native(ensure_rgba(img), labels, tmp_path, 4)
    assert n == len(np.unique(labels))
    canvas = reassemble_array(tmp_path)
    np.testing.assert_array_equal(canvas, ensure_rgba(img))


def test_native_metadata_matches_python(tmp_path, rng):
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    labels = np.zeros((32, 32), np.int64)
    labels[:, 16:] = 2
    write_slices(img, labels, tmp_path, "nat", use_native=True)
    write_slices(img, labels, tmp_path, "py", use_native=False)
    rec_n, wn, hn = read_metadata_binary(tmp_path / "nat" / "metadata.bin")
    rec_p, wp, hp = read_metadata_binary(tmp_path / "py" / "metadata.bin")
    assert (wn, hn) == (wp, hp) == (32, 32)
    assert sorted((r.label, r.filename, r.x, r.y, r.width, r.height)
                  for r in rec_n) == \
        sorted((r.label, r.filename, r.x, r.y, r.width, r.height)
               for r in rec_p)
    # pixel-identical reconstructions
    np.testing.assert_array_equal(reassemble_array(tmp_path / "nat"),
                                  reassemble_array(tmp_path / "py"))


def test_write_slices_auto_uses_native(tmp_path, rng):
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    labels = np.zeros((16, 16), np.int64)
    assert write_slices(img, labels, tmp_path, "auto")
    assert (tmp_path / "auto" / "slice_0.png").exists()
