"""Batched grid-seeded watershed segmentation in pure JAX.

TPU re-design of the reference extractor (watershed_edge.cpp:44-111), which
seeds markers on a regular grid (stride 16) and runs cv::watershed (Meyer's
priority flooding by color difference). Here the priority queue becomes
minimum-barrier relaxation: every pixel adopts the label of the 4-neighbor
path from a seed that minimizes the path's maximum color difference
("minimum barrier distance" flooding — the parallel formulation of watershed
by flooding). Each relaxation sweep is a handful of plane shifts and
elementwise mins, iterated to a fixpoint — no priority queue, no
level-scheduled inner loops (a previous level-scheduled implementation spent
seconds per batch in nested while_loops).

Divergence (documented): cv::watershed leaves 1-pixel ridge lines labeled -1
which the reference treats as always-cut (watershed_edge.cpp:85-106); our
flooding assigns every pixel a basin, so cuts are exactly the label
boundaries — statistically equivalent targets with 1px-thinner cut bands.
Validated against cv2.watershed in tests/test_extractors.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_compression_tpu.ops.color import gaussian_blur, to_u8
from image_compression_tpu.ops.edges import edges_from_labels

BIG = 1e9


def _grid_markers(height: int, width: int, stride: int) -> jnp.ndarray:
    """Seed labels 1..K on a regular grid at stride/2 offsets
    (watershed_edge.cpp:61-71); 0 = unlabeled."""
    ys = jnp.arange(stride // 2, height, stride)
    xs = jnp.arange(stride // 2, width, stride)
    markers = jnp.zeros((height, width), jnp.int32)
    k = ys.shape[0] * xs.shape[0]
    ids = jnp.arange(1, k + 1, dtype=jnp.int32).reshape(ys.shape[0],
                                                        xs.shape[0])
    markers = markers.at[ys[:, None], xs[None, :]].set(ids)
    if k == 0:
        markers = markers.at[height // 2, width // 2].set(1)
    return markers


def _neighbor_diffs(image_u8f: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [H, W, 4] max-channel abs diff to (right, left, down,
    up); cv::watershed's edge priority. Out-of-bounds neighbors get BIG."""
    def diff(shifted, valid):
        d = jnp.max(jnp.abs(image_u8f - shifted), axis=-1)
        return jnp.where(valid, d, BIG)

    h, w = image_u8f.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pad_r = jnp.pad(image_u8f, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    pad_l = jnp.pad(image_u8f, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    pad_d = jnp.pad(image_u8f, ((0, 1), (0, 0), (0, 0)))[1:]
    pad_u = jnp.pad(image_u8f, ((1, 0), (0, 0), (0, 0)))[:-1]
    return jnp.stack([
        diff(pad_r, xs + 1 < w), diff(pad_l, xs > 0),
        diff(pad_d, ys + 1 < h), diff(pad_u, ys > 0)], axis=-1)


@functools.partial(jax.jit, static_argnames=("seed_stride", "blur_ksize",
                                             "blur_sigma", "max_iters"))
def watershed_labels(image: jnp.ndarray, seed_stride: int = 16,
                     blur_ksize: int = 3, blur_sigma: float = 1.0,
                     max_iters: int = 256) -> jnp.ndarray:
    """One image [H, W, C] float [0,1] or uint8 -> labels [H, W] int32 >= 1.

    Defaults mirror watershed_edge.h:10-15.
    """
    img = image if image.dtype == jnp.uint8 else to_u8(image)
    img = img.astype(jnp.float32)
    if blur_ksize >= 3 and blur_ksize % 2 == 1:
        img = jnp.round(gaussian_blur(
            jnp.moveaxis(img, -1, 0), blur_ksize, blur_sigma))
        img = jnp.moveaxis(img, 0, -1)
    height, width = img.shape[:2]
    markers = _grid_markers(height, width, seed_stride)
    diffs = _neighbor_diffs(img)

    labeled = markers > 0
    barrier0 = jnp.where(labeled, 0.0, BIG)

    def shift(x, dy, dx, fill):
        pad = ((max(0, dy), max(0, -dy)), (max(0, dx), max(0, -dx)))
        out = jnp.pad(x, pad, constant_values=fill)
        return out[max(0, -dy):max(0, -dy) + height,
                   max(0, -dx):max(0, -dx) + width]

    def sweep(state):
        label, barrier, _changed, it = state
        # candidates from each neighbor: barrier = max(neighbor barrier,
        # crossing diff); right/left/down/up order matches _neighbor_diffs
        neigh = [
            (shift(label, 0, -1, 0), shift(barrier, 0, -1, BIG), diffs[..., 0]),
            (shift(label, 0, 1, 0), shift(barrier, 0, 1, BIG), diffs[..., 1]),
            (shift(label, -1, 0, 0), shift(barrier, -1, 0, BIG), diffs[..., 2]),
            (shift(label, 1, 0, 0), shift(barrier, 1, 0, BIG), diffs[..., 3]),
        ]
        best_b = barrier
        best_l = label
        for nl, nb, nd in neigh:
            cand = jnp.maximum(nb, nd)
            take = (cand < best_b) & (nl > 0)
            best_b = jnp.where(take, cand, best_b)
            best_l = jnp.where(take, nl, best_l)
        # seeds never change
        best_l = jnp.where(labeled, markers, best_l)
        best_b = jnp.where(labeled, 0.0, best_b)
        changed = jnp.any(best_l != label) | jnp.any(best_b != barrier)
        return best_l, best_b, changed, it + 1

    def cond(state):
        return state[2] & (state[3] < max_iters)

    label, _, _, _ = jax.lax.while_loop(
        cond, sweep, (markers, barrier0, jnp.asarray(True), jnp.asarray(0)))
    # unreached pixels (none on a connected grid with >= 1 seed) -> label 1
    return jnp.maximum(label, 1)


def watershed_edge_costs(images: jnp.ndarray, seed_stride: int = 16,
                         blur_ksize: int = 3,
                         blur_sigma: float = 1.0) -> jnp.ndarray:
    """Edge-cost planes [..., H, W, 2]: connect (1) iff both endpoints share a
    basin (watershed_edge.cpp:83-108). Batched over leading dims."""
    fn = functools.partial(watershed_labels, seed_stride=seed_stride,
                           blur_ksize=blur_ksize, blur_sigma=blur_sigma)
    if images.ndim == 4:
        labels = jax.vmap(fn)(images)
    else:
        labels = fn(images)
    return edges_from_labels(labels)
