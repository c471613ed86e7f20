"""Compact device->host label wire format: bit-packed connectivity planes.

The compress pipeline's device half ends with a label map that must reach
the host slicer. The reference ships the full label tensor
(compress.cpp:141-142); round-3 shipped uint16 minlabel maps — 128 KB/img,
~4 ms/img through this environment's ~32 MB/s fetch relay, the measured
ceiling on e2e throughput (VERDICT round-3 missing #2).

A multicut labeling of a grid is fully determined by its inter-pixel
CONNECTIVITY: two 1-bit planes (horizontal: (y,x)-(y,x+1) connected;
vertical: (y,x)-(y+1,x) connected). Packing those bits 8-per-byte ships
2 bits/pixel — 16 KB/img at 256x256, an 8x fetch reduction — and the host
reconstructs the exact minlabel ids with a min-root union-find
(native/pngio.cpp::pngio_labels_from_conn; numpy/scipy fallback here), so
downstream bytes (slice PNGs, metadata.bin) are identical to the uint16
path bit-for-bit (tests/test_labels_wire.py).

Bit order is LSB-first: bit k of byte j in row y covers column 8*j + k.
Both planes are [H, ceil(W/8)]; the horizontal plane's last column and the
vertical plane's last row are zero padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def pack_connectivity(labels_bhw: jnp.ndarray) -> tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """labels [..., H, W] int -> (hbits, vbits) uint8 [..., H, ceil(W/8)]."""
    height, width = labels_bhw.shape[-2], labels_bhw.shape[-1]
    stride = -(-width // 8)
    pad_w = stride * 8 - width

    h_conn = labels_bhw[..., :, :-1] == labels_bhw[..., :, 1:]
    v_conn = labels_bhw[..., :-1, :] == labels_bhw[..., 1:, :]
    lead = [(0, 0)] * (labels_bhw.ndim - 2)
    # h: pad the missing last column; v: pad the missing last row; both pad
    # the row out to a whole number of bytes
    h_conn = jnp.pad(h_conn, lead + [(0, 0), (0, 1 + pad_w)])
    v_conn = jnp.pad(v_conn, lead + [(0, 1), (0, pad_w)])

    weights = (2 ** jnp.arange(8, dtype=jnp.int32)).astype(jnp.uint8)

    def pack(bits):
        b8 = bits.reshape(bits.shape[:-1] + (stride, 8)).astype(jnp.uint8)
        return jnp.sum(b8 * weights, axis=-1, dtype=jnp.uint8)

    return pack(h_conn), pack(v_conn)


def unpack_connectivity(hbits: np.ndarray, vbits: np.ndarray,
                        width: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-side unpack: (hconn, vconn) bool [H, W] (padding columns/rows
    dropped back to the in-image semantics: hconn[:, -1] and vconn[-1, :]
    are False)."""
    hconn = np.unpackbits(hbits, axis=-1, bitorder="little")[:, :width] > 0
    vconn = np.unpackbits(vbits, axis=-1, bitorder="little")[:, :width] > 0
    return hconn, vconn


def labels_from_connectivity(hbits: np.ndarray, vbits: np.ndarray,
                             height: int, width: int) -> np.ndarray:
    """Pure-Python reconstruction (fallback for the native union-find):
    doubled-grid connected components — pixel nodes at even coordinates,
    connectivity bits as edge nodes between them — then every component is
    relabeled to its smallest flat pixel index (the device solver's
    minlabel contract, ops/multicut.py). Returns int32 [H, W]."""
    from scipy import ndimage

    hconn, vconn = unpack_connectivity(hbits, vbits, width)
    grid = np.zeros((2 * height - 1, 2 * width - 1), bool)
    grid[::2, ::2] = True
    grid[::2, 1::2] = hconn[:, :width - 1]
    grid[1::2, ::2] = vconn[:height - 1, :]
    cc, ncc = ndimage.label(grid)          # default structure = 4-connected
    cc_pix = cc[::2, ::2]
    flat = np.arange(height * width, dtype=np.int64).reshape(height, width)
    minlab = ndimage.minimum(flat, labels=cc_pix,
                             index=np.arange(1, ncc + 1))
    return np.asarray(minlab, np.int32)[cc_pix - 1]
