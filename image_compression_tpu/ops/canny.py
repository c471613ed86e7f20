"""Batched Canny edge extraction in pure JAX.

TPU re-design of the reference's OpenCV-backed extractor
(canny_edge.cpp:52-98): gray -> Gaussian blur -> Sobel -> L2 gradient ->
non-max suppression -> hysteresis (strong/weak linking as a fixpoint of
masked dilation). Unlike the reference (one host image at a time in
dataloader workers), everything here is batched and jittable; not bit-exact
with cv::Canny (different NMS tie-breaking) but statistically equivalent —
validated against OpenCV in tests/test_canny.py.

Edge-cost contract: an inter-pixel edge is cut (0) if either endpoint is a
Canny edge pixel, else connect (1) (canny_edge.cpp:77-95).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_compression_tpu.ops.color import gaussian_blur, rgb_to_gray_u8


def _sobel(gray: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients with replicate borders. gray: [..., H, W] f32."""
    pad = [(0, 0)] * (gray.ndim - 2) + [(1, 1), (1, 1)]
    x = jnp.pad(gray, pad, mode="edge")
    height, width = gray.shape[-2:]

    def s(dy, dx):
        return x[..., 1 + dy:1 + dy + height, 1 + dx:1 + dx + width]

    gx = (s(-1, 1) + 2 * s(0, 1) + s(1, 1)
          - s(-1, -1) - 2 * s(0, -1) - s(1, -1))
    gy = (s(1, -1) + 2 * s(1, 0) + s(1, 1)
          - s(-1, -1) - 2 * s(-1, 0) - s(-1, 1))
    return gx, gy


def _nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Suppress non-maxima along the quantized gradient direction."""
    pad = [(0, 0)] * (mag.ndim - 2) + [(1, 1), (1, 1)]
    m = jnp.pad(mag, pad)
    height, width = mag.shape[-2:]

    def s(dy, dx):
        return m[..., 1 + dy:1 + dy + height, 1 + dx:1 + dx + width]

    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    tan22 = 0.4142135623730951
    tan67 = 2.414213562373095
    diag_sign = (gx * gy) >= 0
    # direction buckets: 0 horizontal gradient (vertical edge), 1 vertical,
    # 2 main diagonal, 3 anti-diagonal
    horiz = ax * tan22 >= ay
    vert = ay * tan22 >= ax
    diag = ~horiz & ~vert & (ay <= ax * tan67)
    del diag  # both diagonal buckets treated by sign below

    n1 = jnp.where(horiz, s(0, 1),
                   jnp.where(vert, s(1, 0),
                             jnp.where(diag_sign, s(1, 1), s(1, -1))))
    n2 = jnp.where(horiz, s(0, -1),
                   jnp.where(vert, s(-1, 0),
                             jnp.where(diag_sign, s(-1, -1), s(-1, 1))))
    return (mag >= n1) & (mag > n2)


def _hysteresis(strong: jnp.ndarray, weak: jnp.ndarray) -> jnp.ndarray:
    """Grow strong edges through weak pixels (8-connected) to fixpoint."""
    height, width = strong.shape[-2:]

    def dilate(x):
        pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
        p = jnp.pad(x, pad)
        out = jnp.zeros_like(x)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                out = out | p[..., 1 + dy:1 + dy + height,
                              1 + dx:1 + dx + width]
        return out

    def body(state):
        edges, _ = state
        grown = dilate(edges) & weak
        return grown, jnp.any(grown != edges)

    # seed with one body step so the carry's `changed` is data-derived
    # (a literal True carry has a different type under shard_map)
    state = body((strong, jnp.any(strong)))
    edges, _ = jax.lax.while_loop(lambda s: s[1], body, state)
    return edges


@functools.partial(jax.jit, static_argnames=("low", "high", "aperture_size",
                                             "l2_gradient", "blur_ksize",
                                             "blur_sigma"))
def canny_edges(images: jnp.ndarray, low: float = 50.0, high: float = 150.0,
                aperture_size: int = 3, l2_gradient: bool = True,
                blur_ksize: int = 3, blur_sigma: float = 1.0) -> jnp.ndarray:
    """Batched Canny edge map. images [..., H, W, C] -> bool [..., H, W].

    Defaults mirror canny_edge.h:10-17.
    """
    del aperture_size  # 3x3 Sobel only (the reference default)
    gray = rgb_to_gray_u8(images).astype(jnp.float32)
    if blur_ksize >= 3 and blur_ksize % 2 == 1:
        # cv::GaussianBlur on u8 rounds back to u8 before Canny
        gray = jnp.round(gaussian_blur(gray, blur_ksize, blur_sigma))
    gx, gy = _sobel(gray)
    if l2_gradient:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)
    keep = _nms(mag, gx, gy)
    strong = keep & (mag > high)
    weak = keep & (mag > low)
    return _hysteresis(strong, weak)


def canny_edge_costs(images: jnp.ndarray, low: float = 50.0,
                     high: float = 150.0, aperture_size: int = 3,
                     l2_gradient: bool = True, blur_ksize: int = 3,
                     blur_sigma: float = 1.0) -> jnp.ndarray:
    """Edge-cost planes [..., H, W, 2]: cut (0) if either endpoint is a Canny
    edge pixel, connect (1) otherwise; padding slots 0
    (canny_edge.cpp:77-95)."""
    edges = canny_edges(images, low, high, aperture_size, l2_gradient,
                        blur_ksize, blur_sigma)
    not_edge = ~edges
    connect_h = not_edge[..., :, :-1] & not_edge[..., :, 1:]
    connect_v = not_edge[..., :-1, :] & not_edge[..., 1:, :]
    h = jnp.pad(connect_h.astype(jnp.float32),
                [(0, 0)] * (edges.ndim - 1) + [(0, 1)])
    v = jnp.pad(connect_v.astype(jnp.float32),
                [(0, 0)] * (edges.ndim - 2) + [(0, 1), (0, 0)])
    return jnp.stack([h, v], axis=-1)
