"""Color conversions and dtype helpers (batched, jittable)."""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray_u8(image: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] uint8/float -> [..., H, W] uint8 luma.

    Uses the BT.601 weights OpenCV applies in cvtColor (the reference
    grayscales via COLOR_BGR2GRAY before Canny, canny_edge.cpp:5-49).
    Float inputs in [0, 1] are scaled to [0, 255] first.
    """
    x = image
    if x.dtype != jnp.uint8:
        x = jnp.clip(jnp.round(x * 255.0), 0, 255)
    x = x.astype(jnp.float32)
    if x.ndim >= 3 and x.shape[-1] >= 3:
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    else:
        gray = x[..., 0] if x.ndim >= 3 else x
    return jnp.clip(jnp.round(gray), 0, 255).astype(jnp.uint8)


def to_u8(image_float01: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> uint8 with round-half-away (matches cv convertTo)."""
    return jnp.clip(jnp.round(image_float01 * 255.0), 0, 255).astype(jnp.uint8)


def gaussian_blur(image: jnp.ndarray, ksize: int = 3,
                  sigma: float = 1.0) -> jnp.ndarray:
    """Separable Gaussian blur with reflect-101 borders (cv default).

    image: [..., H, W] float32. Matches cv::GaussianBlur(k, sigma) up to
    float rounding.
    """
    if ksize < 3 or ksize % 2 == 0:
        return image
    half = ksize // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8  # cv's default rule
    kernel = jnp.exp(-0.5 * (xs / sigma) ** 2)
    kernel = kernel / kernel.sum()

    height, width = image.shape[-2:]
    pad = [(0, 0)] * (image.ndim - 2) + [(half, half), (half, half)]
    x = jnp.pad(image, pad, mode="reflect")
    # horizontal then vertical pass via shifted sums (ksize is tiny)
    h = sum(kernel[i] * x[..., :, i:i + width] for i in range(ksize))
    v = sum(kernel[i] * h[..., i:i + height, :] for i in range(ksize))
    return v
