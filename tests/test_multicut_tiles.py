"""Tile presolve: validity of the intra-tile contraction (the sorted
fallback path; the default solve is ops/multicut_hier.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from image_compression_tpu.ops.multicut import multicut_objective
from image_compression_tpu.ops.multicut_tiles import (boundary_edges,
                                                      tile_presolve)


def random_costs(rng, h=32, w=32):
    return rng.normal(size=(h, w, 2)).astype(np.float32)


def check_valid(labels, tile):
    labels = np.asarray(labels)
    h, w = labels.shape
    for lab in np.unique(labels):
        ys, xs = np.where(labels == lab)
        # the id is the pixel index of some member (a contraction root)
        assert lab in (ys * w + xs)
        # region contained in one tile
        assert len(np.unique(ys // tile)) == 1
        assert len(np.unique(xs // tile)) == 1
        # connected
        assert ndimage.label(labels == lab)[1] == 1


def test_xla_presolve_valid(rng):
    labels = tile_presolve(jnp.asarray(random_costs(rng)), 16, 4)
    check_valid(labels, 16)


def test_all_positive_contracts_strongly(rng):
    """All-equal positive costs are the adversarial tie case for the
    coin-gated matching; the presolve still shrinks each tile to a handful
    of regions (the global phases finish the job — test_multicut checks the
    full solver yields one cluster)."""
    costs = jnp.ones((32, 32, 2))
    labels = np.asarray(tile_presolve(costs, 16, 6))
    assert len(np.unique(labels)) <= 4 * 40
    check_valid(labels, 16)


def test_all_negative_no_merges(rng):
    costs = -jnp.ones((32, 32, 2))
    labels = np.asarray(tile_presolve(costs, 16, 2))
    assert len(np.unique(labels)) == 32 * 32


def test_boundary_edges_structure():
    u, v, slot = boundary_edges(64, 64, 16)
    # 2 * (64/16 - 1 columns of crossings... count: horizontal crossings:
    # rows*boundaries = 64*3; vertical: 64*3
    assert len(u) == 64 * 3 * 2
    assert (v > u).all()
    # horizontal crossings differ by 1, vertical by width
    diffs = v - u
    assert set(np.unique(diffs)) <= {1, 64}
