"""Canny extractor: structural checks plus statistical agreement with
OpenCV's cv::Canny (the reference's backend, canny_edge.cpp:70)."""

import cv2
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.ops.canny import canny_edge_costs, canny_edges
from image_compression_tpu.ops.edges import edge_validity_masks


def synthetic_image(rng, h=96, w=96):
    """Blocky image with clear step edges plus mild noise."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = (40, 90, 160)
    img[20:70, 25:80] = (200, 60, 30)
    img[50:90, 5:40] = (90, 220, 120)
    noise = rng.normal(0, 4, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def f1(a, b):
    tp = (a & b).sum()
    return 2 * tp / max(a.sum() + b.sum(), 1)


def test_matches_opencv_statistically(rng):
    img = synthetic_image(rng)
    ours = np.asarray(canny_edges(jnp.asarray(img)))
    gray = cv2.cvtColor(img[..., ::-1], cv2.COLOR_BGR2GRAY)
    gray = cv2.GaussianBlur(gray, (3, 3), 1.0)
    ref = cv2.Canny(gray, 50, 150, apertureSize=3, L2gradient=True) > 0
    score = f1(ours, ref)
    assert score > 0.75, f"F1 vs OpenCV = {score:.3f}"


def test_flat_image_no_edges():
    img = jnp.full((32, 32, 3), 128, jnp.uint8)
    assert not bool(canny_edges(img).any())


def test_step_edge_detected():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    edges = np.asarray(canny_edges(jnp.asarray(img)))
    # an edge line along the step, nowhere else
    assert edges[:, 14:18].any(axis=1).all()
    assert not edges[:, :10].any() and not edges[:, 22:].any()


def test_edge_costs_contract():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255
    costs = np.asarray(canny_edge_costs(jnp.asarray(img)))
    assert costs.shape == (16, 16, 2)
    masks = np.asarray(edge_validity_masks(16, 16))
    # padding slots zero
    assert (costs * (1 - masks)).sum() == 0
    # far from the step: connect; across the step: cut
    assert (costs[:, :4, 0] == 1).all()
    assert (costs[:, 12:14, 0] == 1).all()
    cut_region = costs[:, 6:10, 0]
    assert (cut_region == 0).any(axis=1).all()


def test_batched(rng):
    imgs = np.stack([synthetic_image(rng), synthetic_image(rng)])
    out = canny_edge_costs(jnp.asarray(imgs))
    assert out.shape == (2, 96, 96, 2)
    single = canny_edge_costs(jnp.asarray(imgs[0]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(single))
