"""EdgeUNet: 3-level U-Net predicting per-pixel edge (mu, sigma) logits.

Exact architecture of the reference model (EdgeUNet.h:13-44):
  inc   DoubleConv(3, 64)
  down1..3: MaxPool(2) + DoubleConv  (64->128->256->512)
  up1..3:   ConvTranspose(k=2, s=2) + pad-correction + skip concat + DoubleConv
  outc  Conv 1x1 -> 4 channels
DoubleConv = 2 x [Conv 3x3 pad 1 -> GroupNorm(8 groups) -> ReLU]
(DoubleConv.h:8-15, Down.h:9-13, Up.h:9-28).

Output channel contract (training.cpp:145-158): channels 0/1 = (mu_raw,
sigma_raw) for horizontal edges, 2/3 for vertical.

TPU-first design choices: NHWC layout (XLA's native conv layout on TPU),
bfloat16 compute with float32 params/normalization statistics — the conv
stack runs on the MXU; GroupNorm/ReLU fuse into the surrounding convs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i}")(x)
            # normalize in f32 for stability, then back to compute dtype
            x = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                             name=f"norm{i}")(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
        return x


class Down(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, self.dtype, name="conv")(x)


class Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up")(x)
        # pad-correction for odd skip sizes (Up.h:20-24)
        dy = skip.shape[-3] - x.shape[-3]
        dx = skip.shape[-2] - x.shape[-2]
        if dy or dx:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 3)
                        + [(dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2),
                           (0, 0)])
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, self.dtype, name="conv")(x)


class EdgeUNet(nn.Module):
    """[B, H, W, 3] float -> [B, H, W, 4] raw edge parameters."""

    edge_channels: int = 4
    base: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        c = self.base
        x1 = DoubleConv(c, self.dtype, name="inc")(x)
        x2 = Down(2 * c, self.dtype, name="down1")(x1)
        x3 = Down(4 * c, self.dtype, name="down2")(x2)
        x4 = Down(8 * c, self.dtype, name="down3")(x3)
        u1 = Up(4 * c, self.dtype, name="up1")(x4, x3)
        u2 = Up(2 * c, self.dtype, name="up2")(u1, x2)
        u3 = Up(c, self.dtype, name="up3")(u2, x1)
        out = nn.Conv(self.edge_channels, (1, 1), dtype=self.dtype,
                      name="outc")(u3)
        return out.astype(jnp.float32)
