"""metadata.bin codec: round-trip and byte-level compatibility with the
reference's packed little-endian layout (metadata.h:12-28)."""

import struct

import pytest

from image_compression_tpu.io.metadata import (
    MAGIC, SliceMetadata, decode_metadata, encode_metadata,
    read_metadata_binary, write_metadata_binary)


def test_roundtrip_empty():
    data = encode_metadata([], 640, 480)
    records, w, h = decode_metadata(data)
    assert records == [] and (w, h) == (640, 480)


def test_roundtrip_records():
    recs = [
        SliceMetadata(0, "slice_0.png", 0, 0, 10, 20),
        SliceMetadata(7, "slice_7.png", 5, 9, 100, 1),
        SliceMetadata(-3, "x.png", -1, -2, 3, 4),
    ]
    records, w, h = decode_metadata(encode_metadata(recs, 256, 512))
    assert records == recs and (w, h) == (256, 512)


def test_exact_byte_layout():
    """Byte-for-byte check against the reference's packed structs
    (SliceRecordHeader + SliceRecordFixed, metadata.cpp:4-34)."""
    rec = SliceMetadata(3, "ab.png", 1, 2, 30, 40)
    data = encode_metadata([rec], 111, 222)
    expected = struct.pack("<IIII", 0x534C4943, 1, 111, 222)
    expected += struct.pack("<iiiiiH", 3, 1, 2, 30, 40, 6) + b"ab.png"
    assert data == expected
    # header is 16 bytes, fixed record 22 bytes: packed, no padding
    assert len(data) == 16 + 22 + 6


def test_magic_is_slic():
    assert struct.pack(">I", MAGIC) == b"SLIC"


def test_bad_magic_raises():
    data = struct.pack("<IIII", 0xDEADBEEF, 0, 1, 1)
    with pytest.raises(ValueError, match="magic"):
        decode_metadata(data)


def test_file_io(tmp_path):
    recs = [SliceMetadata(1, "slice_1.png", 4, 5, 6, 7)]
    path = tmp_path / "metadata.bin"
    write_metadata_binary(recs, path, 64, 32)
    records, w, h = read_metadata_binary(path)
    assert records == recs and (w, h) == (64, 32)


def test_unicode_filename():
    recs = [SliceMetadata(0, "slïce.png", 0, 0, 1, 1)]
    records, _, _ = decode_metadata(encode_metadata(recs, 8, 8))
    assert records == recs
