"""Pack container (io/pack.py): one SLPK file per image holding the exact
bytes of the reference's loose layout (image_slicer.cpp:81-130 parity at the
content level), lossless round trip through both the native and the Python
writer, and byte-identity when unpacked back to the loose layout."""

import numpy as np
import pytest

from image_compression_tpu.io import native
from image_compression_tpu.io.pack import is_pack, read_pack, unpack_to_dir
from image_compression_tpu.io.reassemble import reassemble_array
from image_compression_tpu.io.slicer import write_slices


def _image_and_labels(rng, h=48, w=40):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    labels = np.zeros((h, w), np.int64)
    labels[10:30, 8:24] = 10 * w + 8          # minlabel-style ids
    labels[35:, 30:] = 35 * w + 30
    return img, labels


@pytest.mark.parametrize("use_native", [True, False])
def test_pack_roundtrip_lossless(tmp_path, rng, use_native):
    if use_native and not native.available():
        pytest.skip("native library not built")
    img, labels = _image_and_labels(rng)
    ok = write_slices(img, labels, tmp_path, "case", container="pack",
                      use_native=use_native)
    assert ok
    pack_path = tmp_path / "case.pack"
    assert is_pack(pack_path)
    canvas = reassemble_array(pack_path)
    assert canvas.shape[:2] == labels.shape
    np.testing.assert_array_equal(canvas[:, :, :3], img)
    assert (canvas[:, :, 3] == 255).all()


def test_pack_bytes_match_loose_layout(tmp_path, rng):
    """unpack_to_dir must recover the loose layout byte-for-byte (same
    encoder, same metadata payload) — the pack is a container, not a
    different format."""
    if not native.available():
        pytest.skip("native library not built")
    img, labels = _image_and_labels(rng)
    write_slices(img, labels, tmp_path, "loose", container="files")
    write_slices(img, labels, tmp_path, "packed", container="pack")
    unpack_to_dir(tmp_path / "packed.pack", tmp_path / "unpacked")

    loose = sorted(p.name for p in (tmp_path / "loose").iterdir())
    unpacked = sorted(p.name for p in (tmp_path / "unpacked").iterdir())
    assert loose == unpacked
    for name in loose:
        assert ((tmp_path / "loose" / name).read_bytes()
                == (tmp_path / "unpacked" / name).read_bytes()), name


def test_pack_metadata_fields(tmp_path, rng):
    img, labels = _image_and_labels(rng)
    write_slices(img, labels, tmp_path, "case", container="pack",
                 use_native=False)
    records, blobs, width, height = read_pack(tmp_path / "case.pack")
    assert (width, height) == (labels.shape[1], labels.shape[0])
    assert len(records) == len(blobs) == len(np.unique(labels))
    for rec, blob in zip(records, blobs):
        assert rec.filename == f"slice_{rec.label}.png"
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"


def test_compress_directory_pack(tmp_path, rng):
    """--pack end to end: compress writes .pack files, reassembly is
    lossless from them (cli/main.py --pack -> pipeline slice_container)."""
    from PIL import Image

    from image_compression_tpu.config import Config, EdgeTarget
    from image_compression_tpu.pipeline import (classical_costs_signed,
                                                compress_arrays)

    img = np.full((64, 64, 3), 40, np.uint8)
    img[12:44, 16:52] = 220
    cfg = Config()
    cfg.multicut.icm_sweeps = 2
    cfg.slice_container = "pack"
    cost_fn = lambda b: classical_costs_signed(b, EdgeTarget.CANNY)  # noqa
    outs = compress_arrays([img], cost_fn, cfg, tmp_path, ["im"])
    assert outs == [tmp_path / "im.pack"]
    canvas = reassemble_array(outs[0])
    np.testing.assert_array_equal(canvas[:, :, :3], img)
