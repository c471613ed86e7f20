"""Compact label wire format: device bit-packing -> host reconstruction.

The contract under test: pack_connectivity(labels) shipped as 2 bits/pixel
reconstructs the EXACT minlabel ids on the host (native union-find and the
scipy fallback), and slicing from the packed planes produces byte-identical
output to slicing from the labels themselves."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from image_compression_tpu.io import native
from image_compression_tpu.io.slicer import write_slices, write_slices_from_conn
from image_compression_tpu.ops.labels_wire import (labels_from_connectivity,
                                                   pack_connectivity)
from image_compression_tpu.ops.multicut import multicut_grid
from image_compression_tpu.utils.pattern_generator import \
    generate_random_partition


def minlabelize(labels: np.ndarray) -> np.ndarray:
    """Relabel each (connected) region to its smallest flat pixel index."""
    h, w = labels.shape
    flat = np.arange(h * w).reshape(h, w)
    out = np.empty_like(labels)
    for lab in np.unique(labels):
        m = labels == lab
        out[m] = flat[m].min()
    return out


@pytest.fixture
def partition_labels(rng):
    lab = generate_random_partition(24, 33, 7, seed=3)
    return minlabelize(lab)


def test_python_roundtrip_exact(partition_labels):
    lab = partition_labels
    h, w = lab.shape
    hb, vb = pack_connectivity(jnp.asarray(lab))
    rec = labels_from_connectivity(np.asarray(hb), np.asarray(vb), h, w)
    np.testing.assert_array_equal(rec, lab)


def test_native_matches_python(partition_labels):
    if not native.available():
        pytest.skip("native library unavailable")
    lab = partition_labels
    h, w = lab.shape
    hb, vb = pack_connectivity(jnp.asarray(lab))
    rec_native = native.labels_from_conn_native(np.asarray(hb),
                                                np.asarray(vb), h, w)
    np.testing.assert_array_equal(rec_native, lab)


def test_solver_labels_roundtrip(rng):
    """multicut labels (the real producer) survive the wire exactly."""
    costs = jnp.asarray(rng.normal(size=(32, 40, 2)), jnp.float32)
    lab = np.asarray(multicut_grid(costs))
    hb, vb = pack_connectivity(jnp.asarray(lab))
    rec = labels_from_connectivity(np.asarray(hb), np.asarray(vb), 32, 40)
    np.testing.assert_array_equal(rec, lab)
    if native.available():
        rec_n = native.labels_from_conn_native(np.asarray(hb),
                                               np.asarray(vb), 32, 40)
        np.testing.assert_array_equal(rec_n, lab)


@pytest.mark.parametrize("container", ["files", "pack"])
def test_slices_from_conn_byte_identical(tmp_path, rng, container,
                                         partition_labels):
    lab = partition_labels
    h, w = lab.shape
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    hb, vb = pack_connectivity(jnp.asarray(lab))

    write_slices(img, lab.astype(np.int64), tmp_path, "ref",
                 container=container)
    write_slices_from_conn(img, np.asarray(hb), np.asarray(vb), tmp_path,
                           "conn", container=container)

    if container == "pack":
        assert (tmp_path / "ref.pack").read_bytes() == \
            (tmp_path / "conn.pack").read_bytes()
        return
    ref_files = sorted(p.name for p in (tmp_path / "ref").iterdir())
    conn_files = sorted(p.name for p in (tmp_path / "conn").iterdir())
    assert ref_files == conn_files
    for name in ref_files:
        assert (tmp_path / "ref" / name).read_bytes() == \
            (tmp_path / "conn" / name).read_bytes(), name


def test_pack_width_not_multiple_of_8(rng):
    lab = minlabelize(generate_random_partition(9, 13, 4, seed=1))
    hb, vb = pack_connectivity(jnp.asarray(lab))
    assert hb.shape == (9, 2) and vb.shape == (9, 2)
    rec = labels_from_connectivity(np.asarray(hb), np.asarray(vb), 9, 13)
    np.testing.assert_array_equal(rec, lab)
