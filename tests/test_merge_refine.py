"""Estimator-guided merge refinement (ops/merge_refine.py): merges exactly
the splits whose predicted union is cheaper, preserves the minlabel
contract, and leaves genuinely distinct regions alone."""

import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.merge_refine import merge_refine_batch


def _nlabels(lab):
    return len(np.unique(lab))


def test_merges_artificial_split_keeps_real_boundary(rng):
    """One 64x64 noise texture split in half (artificial cut) next to a
    statistically different texture (real cut): the refinement must merge
    the former and keep the latter."""
    img = np.zeros((64, 64, 3), np.float32)
    img[:, :32] = rng.normal(0.3, 0.02, (64, 32, 3))
    img[:, 32:] = rng.normal(0.75, 0.25, (64, 32, 3))
    img = np.clip(img, 0, 1)
    labels = np.zeros((64, 64), np.int32)
    labels[:32, :32] = 0          # artificial split of the left texture
    labels[32:, :32] = 32 * 64
    labels[:, 32:] = 32           # the genuinely different region
    out = np.asarray(merge_refine_batch(
        jnp.asarray(img[None]), jnp.asarray(labels[None]), k_max=8,
        rounds=1, max_pairs=4)[0])
    # left halves merged into one region keeping the SMALLEST label
    assert (out[:, :32] == 0).all(), np.unique(out[:, :32])
    # the real boundary survived
    assert (out[:, 32:] == 32).all()
    assert _nlabels(out) == 2


def test_rounds_compose_to_multiway_merges(rng):
    """A texture split into 4 quadrant pieces needs 2 rounds (matching is
    conflict-free within a round) — rounds must compose."""
    img = np.clip(rng.normal(0.5, 0.03, (64, 64, 3)), 0, 1).astype(
        np.float32)
    labels = np.zeros((64, 64), np.int32)
    labels[:32, 32:] = 32
    labels[32:, :32] = 32 * 64
    labels[32:, 32:] = 32 * 64 + 32
    out = np.asarray(merge_refine_batch(
        jnp.asarray(img[None]), jnp.asarray(labels[None]), k_max=8,
        rounds=2, max_pairs=4)[0])
    assert _nlabels(out) == 1
    assert (out == 0).all()       # minlabel: smallest original label wins


def test_noop_on_single_region(rng):
    img = rng.random((32, 32, 3)).astype(np.float32)
    labels = np.zeros((32, 32), np.int32)
    out = np.asarray(merge_refine_batch(
        jnp.asarray(img[None]), jnp.asarray(labels[None]), k_max=8,
        rounds=2, max_pairs=4)[0])
    assert (out == 0).all()


def test_distinct_mosaic_cells_not_merged(rng):
    """Four cells with strongly distinct statistics (the mixture-entropy
    corpus mechanism): merging any pair costs more than the container
    floor it saves, so refinement must change nothing."""
    img = np.zeros((64, 64, 3), np.float32)
    img[:32, :32] = rng.normal(0.2, 0.01, (32, 32, 3))
    img[:32, 32:] = rng.normal(0.8, 0.30, (32, 32, 3))
    img[32:, :32] = rng.normal(0.5, 0.10, (32, 32, 3))
    img[32:, 32:] = rng.normal(0.35, 0.45, (32, 32, 3))
    img = np.clip(img, 0, 1)
    labels = np.zeros((64, 64), np.int32)
    labels[:32, 32:] = 32
    labels[32:, :32] = 32 * 64
    labels[32:, 32:] = 32 * 64 + 32
    out = np.asarray(merge_refine_batch(
        jnp.asarray(img[None]), jnp.asarray(labels[None]), k_max=8,
        rounds=2, max_pairs=4)[0])
    np.testing.assert_array_equal(out, labels)


def test_declined_images_are_noop(rng):
    """Pipeline invariant (ORDER MATTERS, pipeline.py): a fallen-back image
    reaches the merge pass as all-zero labels — one region, no adjacent
    pairs — and must come out EXACTLY all-zero, so the naturals
    never-expand guarantee cannot be disturbed by refinement."""
    img = rng.random((64, 64, 3)).astype(np.float32)
    zero = np.zeros((64, 64), np.int32)
    # batch mixes a declined (all-zero) image with a kept split that merges
    img2 = np.clip(rng.normal(0.5, 0.03, (64, 64, 3)), 0, 1).astype(
        np.float32)
    lab2 = np.zeros((64, 64), np.int32)
    lab2[:, 32:] = 32
    out = np.asarray(merge_refine_batch(
        jnp.asarray(np.stack([img, img2])),
        jnp.asarray(np.stack([zero, lab2])), k_max=8, rounds=2,
        max_pairs=4))
    assert (out[0] == 0).all()
    assert _nlabels(out[1]) == 1  # the split image merged
