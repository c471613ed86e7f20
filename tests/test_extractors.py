"""Watershed, SLIC, and Felzenszwalb extractors: structural invariants and
statistical agreement with their OpenCV counterparts where base cv2 has them
(SURVEY.md section 4(c))."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from image_compression_tpu.config import EdgeTarget
from image_compression_tpu.ops.graph_based import felzenszwalb_labels
from image_compression_tpu.ops.slic import slic_labels
from image_compression_tpu.ops.targets import (compute_edge_costs,
                                               create_target_with_mask)
from image_compression_tpu.ops.watershed import watershed_labels


def blocky_image(rng, h=96, w=96, noise=3.0):
    img = np.zeros((h, w, 3), np.float32)
    img[:, :] = (0.2, 0.4, 0.6)
    img[15:70, 20:75] = (0.8, 0.25, 0.1)
    img[55:90, 5:45] = (0.3, 0.85, 0.4)
    img += rng.normal(0, noise / 255.0, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def components_connected(labels):
    for lab in np.unique(labels):
        _, num = ndimage.label(labels == lab)
        if num != 1:
            return False
    return True


def boundary_agreement(a, b):
    """F1 between the boundary maps of two segmentations, with 1px slack."""
    def boundary(lab):
        bnd = np.zeros(lab.shape, bool)
        bnd[:, :-1] |= lab[:, :-1] != lab[:, 1:]
        bnd[:-1, :] |= lab[:-1, :] != lab[1:, :]
        return bnd

    ba, bb = boundary(a), boundary(b)
    dil = ndimage.binary_dilation
    tp_a = (ba & dil(bb, iterations=1)).sum()
    tp_b = (bb & dil(ba, iterations=1)).sum()
    prec = tp_a / max(ba.sum(), 1)
    rec = tp_b / max(bb.sum(), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


# ---------------------------------------------------------------- watershed

def test_watershed_covers_all_pixels(rng):
    img = blocky_image(rng)
    labels = np.asarray(watershed_labels(jnp.asarray(img)))
    assert (labels >= 1).all()
    # ~ (96/16)^2 = 36 seeds
    assert 10 <= len(np.unique(labels)) <= 36


def test_watershed_flat_image_voronoi_like(rng):
    img = np.full((64, 64, 3), 0.5, np.float32)
    labels = np.asarray(watershed_labels(jnp.asarray(img)))
    assert (labels >= 1).all()
    assert len(np.unique(labels)) == 16


def test_watershed_vs_opencv(rng):
    img = blocky_image(rng)
    ours = np.asarray(watershed_labels(jnp.asarray(img)))

    u8 = (img[..., ::-1] * 255).round().astype(np.uint8)  # BGR for cv
    u8 = cv2.GaussianBlur(u8, (3, 3), 1.0)
    markers = np.zeros(img.shape[:2], np.int32)
    lab = 0
    for y in range(8, 96, 16):
        for x in range(8, 96, 16):
            lab += 1
            markers[y, x] = lab
    cv2.watershed(u8, markers)
    markers[markers < 0] = 0
    score = boundary_agreement(ours, np.where(markers == 0, ours, markers))
    assert score > 0.5, f"boundary F1 vs cv2.watershed = {score:.3f}"


# --------------------------------------------------------------------- SLIC

def test_slic_connected_and_sized(rng):
    img = blocky_image(rng)
    labels = np.asarray(slic_labels(jnp.asarray(img)))
    assert components_connected(labels)
    sizes = np.bincount(labels.ravel())
    sizes = sizes[sizes > 0]
    assert sizes.min() >= 100  # 25% of 20x20 superpixel area
    # roughly (96/20)^2 = 23 superpixels
    assert 4 <= len(sizes) <= 40


def test_slic_boundaries_follow_color_edges(rng):
    img = blocky_image(rng, noise=1.0)
    labels = np.asarray(slic_labels(jnp.asarray(img)))
    # strong color step at x=20 within rows 15..70: superpixels should not
    # straddle it (sample interior points of the two blocks)
    assert labels[40, 10] != labels[40, 40]


# ------------------------------------------------------------- felzenszwalb

def test_felzenszwalb_flat_image_single_segment():
    img = jnp.full((64, 64, 3), 0.5)
    labels = np.asarray(felzenszwalb_labels(img))
    assert len(np.unique(labels)) == 1


def test_felzenszwalb_recovers_blocks(rng):
    img = blocky_image(rng, noise=2.0)
    labels = np.asarray(felzenszwalb_labels(jnp.asarray(img), min_size=100))
    uniq = np.unique(labels)
    # the parallel Boruvka variant over-segments slightly vs sequential
    # Kruskal; 3 plateaus -> a handful of segments
    assert 2 <= len(uniq) <= 12
    # the three plateau interiors get distinct segments
    assert labels[5, 5] != labels[40, 40]
    assert labels[40, 40] != labels[80, 20]
    sizes = np.bincount(labels.ravel())
    assert sizes[sizes > 0].min() >= 100


def test_felzenszwalb_min_size(rng):
    img = blocky_image(rng, noise=6.0)
    labels = np.asarray(felzenszwalb_labels(jnp.asarray(img), min_size=250))
    sizes = np.bincount(labels.ravel())
    assert sizes[sizes > 0].min() >= 250


# ------------------------------------------------------------------ targets

@pytest.mark.parametrize("target", list(EdgeTarget))
def test_targets_shapes_and_masks(rng, target):
    imgs = jnp.asarray(np.stack([blocky_image(rng, 48, 48)] * 2))
    t = create_target_with_mask(imgs, target)
    assert t.shape == (2, 48, 48, 4)
    tn = np.asarray(t)
    assert set(np.unique(tn[..., 0])) <= {0.0, 1.0}
    assert (tn[..., 2][:, :, -1] == 0).all()   # mask_right last col
    assert (tn[..., 3][:, -1, :] == 0).all()   # mask_down last row
    assert (tn[..., 2][:, :, :-1] == 1).all()
    costs = compute_edge_costs(imgs, target)
    assert costs.shape == (2, 48, 48, 2)


def test_felzenszwalb_hier_matches_pixel_space(rng):
    """The hierarchical dense implementation and the pixel-space fallback
    agree structurally (same criterion, different parallel order): high
    boundary F1 and similar segment counts on a blocky image."""
    img = blocky_image(rng, noise=2.0)
    lab_h = np.asarray(felzenszwalb_labels(jnp.asarray(img), min_size=100,
                                           hier=True))
    lab_p = np.asarray(felzenszwalb_labels(jnp.asarray(img), min_size=100,
                                           hier=False))
    f1 = boundary_agreement(lab_h, lab_p)
    # measured 0.73-0.92 over seeds 0-4 (round 3); bound set just below the
    # worst observed so the test constrains rather than documents
    assert f1 > 0.7, f1
    n_h, n_p = len(np.unique(lab_h)), len(np.unique(lab_p))
    assert abs(n_h - n_p) <= 6, (n_h, n_p)
