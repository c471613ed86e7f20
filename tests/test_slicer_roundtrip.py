"""North-star check: slice -> write PNGs + metadata -> reassemble is
bit-exact (SURVEY.md section 4(b))."""

import numpy as np

from image_compression_tpu.io.image_io import ensure_rgba, load_image, write_image
from image_compression_tpu.io.metadata import read_metadata_binary
from image_compression_tpu.io.reassemble import reassemble, reassemble_array
from image_compression_tpu.io.slicer import compute_bounding_boxes, write_slices
from image_compression_tpu.utils.pattern_generator import GENERATORS
from image_compression_tpu.utils.random_partition import random_rect_partition


def test_bounding_boxes(rng):
    labels = np.zeros((16, 16), np.int64)
    labels[3:7, 2:10] = 1
    labels[15, 15] = 2
    boxes = compute_bounding_boxes(labels)
    assert boxes[1] == (2, 3, 8, 4)
    assert boxes[2] == (15, 15, 1, 1)
    assert boxes[0][0] == 0 and boxes[0][1] == 0


def test_roundtrip_rect_partition(tmp_path, rng):
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    labels = random_rect_partition(64, 48, min_h=8, min_w=8,
                                  min_rect_count=4, seed=7)
    assert write_slices(img, labels, tmp_path, "case")
    canvas = reassemble_array(tmp_path / "case")
    np.testing.assert_array_equal(canvas, ensure_rgba(img))


def test_roundtrip_random_labels(tmp_path, rng):
    """Disconnected, sparse label ids with gaps still round-trip."""
    img = rng.integers(0, 256, (32, 32, 4), np.uint8)
    img[:, :, 3] = 255  # opaque: alpha>0 mask must capture every pixel
    labels = rng.choice([0, 5, 9], size=(32, 32)).astype(np.int64)
    assert write_slices(img, labels, tmp_path, "sparse")
    canvas = reassemble_array(tmp_path / "sparse")
    np.testing.assert_array_equal(canvas, img)


def test_roundtrip_via_files(tmp_path, rng):
    img = rng.integers(0, 256, (40, 40, 3), np.uint8)
    labels = np.repeat(np.arange(4), 10)[:, None] * np.ones((1, 40), np.int64)
    write_slices(img, labels.astype(np.int64), tmp_path, "f")
    out = tmp_path / "reconstructed.png"
    assert reassemble(tmp_path / "f", out)
    np.testing.assert_array_equal(load_image(out), ensure_rgba(img))


def test_metadata_contents(tmp_path, rng):
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    labels = np.zeros((20, 30), np.int64)
    labels[:, 15:] = 3
    write_slices(img, labels, tmp_path, "m")
    records, w, h = read_metadata_binary(tmp_path / "m" / "metadata.bin")
    assert (w, h) == (30, 20)
    by_label = {r.label: r for r in records}
    assert set(by_label) == {0, 3}
    assert (by_label[0].x, by_label[0].y, by_label[0].width, by_label[0].height) == (0, 0, 15, 20)
    assert (by_label[3].x, by_label[3].y, by_label[3].width, by_label[3].height) == (15, 0, 15, 20)
    assert by_label[3].filename == "slice_3.png"


def test_roundtrip_synthetic_patterns(tmp_path, rng):
    """Every synthetic compressibility class survives the pipeline."""
    for name, gen in GENERATORS.items():
        img = gen(32, 24, False, rng)
        labels = random_rect_partition(24, 32, min_h=4, min_w=4, seed=3)
        write_slices(img, labels, tmp_path, name)
        canvas = reassemble_array(tmp_path / name)
        np.testing.assert_array_equal(canvas, ensure_rgba(img), err_msg=name)


def test_write_image_forces_png_suffix(tmp_path, rng):
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    assert write_image(tmp_path / "x.jpeg", img)
    assert (tmp_path / "x.png").exists()

def test_write_slices_rejects_non_png_format(tmp_path, rng):
    """image_format != png would write files whose names mismatch their
    metadata (write_image forces .png); it must be rejected up front."""
    import pytest
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    labels = np.zeros((8, 8), np.int64)
    with pytest.raises(ValueError, match="png"):
        write_slices(img, labels, tmp_path, "bad", image_format="jpeg")


def test_roundtrip_16bit(tmp_path, rng):
    """16-bit images keep their depth through slice -> reassemble
    (reference loads IMREAD_UNCHANGED, image_loader.cpp:34-43)."""
    img = rng.integers(0, 65536, (24, 20, 3), np.uint16)
    labels = random_rect_partition(24, 20, min_h=4, min_w=4, seed=5)
    assert write_slices(img, labels, tmp_path, "deep")
    canvas = reassemble_array(tmp_path / "deep")
    assert canvas.dtype == np.uint16
    np.testing.assert_array_equal(canvas, ensure_rgba(img))


def test_write_load_16bit_image(tmp_path, rng):
    for c in (1, 3, 4):
        img = rng.integers(0, 65536, (10, 12, c), np.uint16)
        assert write_image(tmp_path / f"d{c}.png", img)
        back = load_image(tmp_path / f"d{c}.png")
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, img)


def test_load_gray_alpha_png(tmp_path, rng):
    """Gray+alpha (color type 4) decodes to RGBA regardless of the decode
    path (native returns 2ch; PIL converts LA)."""
    from PIL import Image
    la = rng.integers(0, 256, (9, 7, 2), np.uint8)
    Image.fromarray(la, mode="LA").save(tmp_path / "la.png")
    arr = load_image(tmp_path / "la.png")
    assert arr.shape == (9, 7, 4)
    np.testing.assert_array_equal(arr[:, :, 0], la[:, :, 0])
    np.testing.assert_array_equal(arr[:, :, 2], la[:, :, 0])
    np.testing.assert_array_equal(arr[:, :, 3], la[:, :, 1])
