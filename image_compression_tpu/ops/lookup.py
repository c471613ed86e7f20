"""Matmul table lookup: TPU-native replacement for large dynamic gathers.

`table[idx]` with a big table and many unsorted indices lowers to a
single-element-row gather on TPU, which executes serially (~70 us per 1k
elements — see CLAUDE.md). For a table of size n = h*l the lookup factors
into two one-hot contractions over the index's high/low digits:

    out[p] = sum_{hi, lo} table[hi, lo] * [idx_hi(p) == hi] * [idx_lo(p) == lo]
           = reduce_lo( onehot_hi[p] @ table2d  *  onehot_lo[p] )

Each (p, lo) partial has exactly one nonzero product, so the result is EXACT
in float32 for any table values representable in f32 (ints < 2^24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_lookup(table: jnp.ndarray, idx: jnp.ndarray,
                  lo_bits: int = 8) -> jnp.ndarray:
    """table: [n] float32 (values exact in f32); idx: [...] int in [0, n).
    Returns table[idx] with matmuls instead of a gather."""
    n = table.shape[0]
    lo_size = 1 << lo_bits
    if n % lo_size:
        table = jnp.pad(table, (0, lo_size - n % lo_size))
    hi_size = table.shape[0] // lo_size
    shape = idx.shape
    flat = idx.reshape(-1)
    hi = flat >> lo_bits
    lo = flat & (lo_size - 1)
    t2d = table.reshape(hi_size, lo_size).astype(jnp.float32)
    oh_hi = jax.nn.one_hot(hi, hi_size, dtype=jnp.float32)   # [P, Hi]
    rows = oh_hi @ t2d                                       # [P, Lo]
    oh_lo = jax.nn.one_hot(lo, lo_size, dtype=jnp.float32)
    out = jnp.sum(rows * oh_lo, axis=-1)
    return out.reshape(shape)
