"""ValueNet: a small conv net predicting the per-image RL reward.

A learned state-value baseline for the REINFORCE phase (cfg.rl.baseline =
"value") — the reference uses only a scalar EMA of the batch-mean reward
(ema_baseline.hpp:4-22), so per-image compressibility differences enter the
advantage as pure variance. V(x) removes them. Documented divergence from
training.cpp:178-181, gated behind a config flag; the default stays
reference-parity.

Architecture: 4 strided 3x3 convs (16-32-64-64, stride 2 each, GroupNorm(8)
+ ReLU) -> global mean pool -> dense -> scalar. ~100k params — negligible
next to the 31M-param U-Net; NHWC/bfloat16 like models/unet.py so the stack
rides the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class ValueNet(nn.Module):
    features: tuple = (16, 32, 64, 64)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] float in [0, 1] -> [B] predicted reward."""
        x = images.astype(self.dtype)
        for i, feat in enumerate(self.features):
            x = nn.Conv(feat, (3, 3), strides=(2, 2), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                             name=f"norm{i}")(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
        x = x.mean(axis=(1, 2)).astype(jnp.float32)  # global average pool
        return nn.Dense(1, dtype=jnp.float32, name="head")(x)[..., 0]
