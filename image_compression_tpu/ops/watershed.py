"""Batched grid-seeded watershed segmentation in pure JAX.

TPU re-design of the reference extractor (watershed_edge.cpp:44-111), which
seeds markers on a regular grid (stride 16) and runs cv::watershed (Meyer's
flooding by color difference). Here the priority-queue flood becomes a
level-scheduled label propagation: repeatedly find the lowest color-difference
level on the labeled/unlabeled frontier and propagate labels across all
frontier edges at or below that level to a fixpoint. Fully batched and
static-shaped.

Divergence (documented): cv::watershed leaves 1-pixel ridge lines labeled -1
which the reference treats as always-cut (watershed_edge.cpp:85-106); our
flooding assigns every pixel a basin, so cuts are exactly the label
boundaries — statistically equivalent targets with 1px-thinner cut bands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_compression_tpu.ops.color import gaussian_blur, to_u8
from image_compression_tpu.ops.edges import edges_from_labels


def _grid_markers(height: int, width: int, stride: int) -> jnp.ndarray:
    """Seed labels 1..K on a regular grid at stride/2 offsets
    (watershed_edge.cpp:61-71); 0 = unlabeled."""
    ys = jnp.arange(stride // 2, height, stride)
    xs = jnp.arange(stride // 2, width, stride)
    markers = jnp.zeros((height, width), jnp.int32)
    k = ys.shape[0] * xs.shape[0]
    ids = jnp.arange(1, k + 1, dtype=jnp.int32).reshape(ys.shape[0], xs.shape[0])
    markers = markers.at[ys[:, None], xs[None, :]].set(ids)
    if k == 0:
        markers = markers.at[height // 2, width // 2].set(1)
    return markers


def _neighbor_diffs(image_u8f: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] -> [H, W, 4] max-channel abs diff to (right, left, down, up);
    cv::watershed's edge priority. Out-of-bounds neighbors get +inf."""
    inf = jnp.float32(1e9)

    def diff(shifted):
        return jnp.max(jnp.abs(image_u8f - shifted), axis=-1)

    pad_r = jnp.pad(image_u8f, ((0, 0), (0, 1), (0, 0)),
                    constant_values=jnp.nan)[:, 1:]
    pad_l = jnp.pad(image_u8f, ((0, 0), (1, 0), (0, 0)),
                    constant_values=jnp.nan)[:, :-1]
    pad_d = jnp.pad(image_u8f, ((0, 1), (0, 0), (0, 0)),
                    constant_values=jnp.nan)[1:]
    pad_u = jnp.pad(image_u8f, ((1, 0), (0, 0), (0, 0)),
                    constant_values=jnp.nan)[:-1]
    out = jnp.stack([diff(pad_r), diff(pad_l), diff(pad_d), diff(pad_u)],
                    axis=-1)
    return jnp.where(jnp.isnan(out), inf, out)


def _flood(markers: jnp.ndarray, diffs: jnp.ndarray,
           max_levels: int) -> jnp.ndarray:
    """Level-scheduled flooding to a fixpoint."""
    inf = jnp.float32(1e9)

    def neighbor_labels(lab):
        return jnp.stack([
            jnp.pad(lab, ((0, 0), (0, 1)))[:, 1:],   # right
            jnp.pad(lab, ((0, 0), (1, 0)))[:, :-1],  # left
            jnp.pad(lab, ((0, 1), (0, 0)))[1:],      # down
            jnp.pad(lab, ((1, 0), (0, 0)))[:-1],     # up
        ], axis=-1)

    def propagate_at(state):
        lab, level, _ = state
        nb = neighbor_labels(lab)
        cand = jnp.where((nb > 0) & (diffs <= level), diffs, inf)
        best = jnp.min(cand, axis=-1)
        pick = jnp.argmin(cand, axis=-1)
        new_lab = jnp.take_along_axis(nb, pick[..., None], axis=-1)[..., 0]
        adopt = (lab == 0) & (best < inf)
        lab2 = jnp.where(adopt, new_lab, lab)
        return lab2, level, jnp.any(adopt)

    def level_step(state):
        lab, _it = state
        nb = neighbor_labels(lab)
        frontier = jnp.where((lab == 0)[..., None] & (nb > 0), diffs, inf)
        level = jnp.min(frontier)
        lab, _, _ = jax.lax.while_loop(
            lambda s: s[2], propagate_at,
            (lab, level, jnp.asarray(True)))
        return lab, _it + 1

    def cond(state):
        lab, it = state
        return jnp.any(lab == 0) & (it < max_levels)

    markers, _ = jax.lax.while_loop(cond, level_step,
                                    (markers, jnp.asarray(0)))
    return markers


@functools.partial(jax.jit, static_argnames=("seed_stride", "blur_ksize",
                                             "blur_sigma", "max_levels"))
def watershed_labels(image: jnp.ndarray, seed_stride: int = 16,
                     blur_ksize: int = 3, blur_sigma: float = 1.0,
                     max_levels: int = 1024) -> jnp.ndarray:
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
    return _flood(markers, diffs, max_levels)


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
