"""End-to-end compress benchmark on one chip.

Measures the device portion of the compress pipeline — EdgeUNet forward +
multicut segmentation + segment stats (the per-image work of
compress.cpp:106-147, minus disk) — in images/sec on batched 256x256 inputs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
vs_baseline is against the 500 img/s/chip v5e target from BASELINE.md (the
reference publishes no numbers).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.edges import (edge_validity_masks,
                                                 split_model_output,
                                                 squash_mu)
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel

    batch, size = 32, 256
    model = EdgeUNet()
    rng = np.random.default_rng(0)
    # smooth-ish synthetic content so the multicut workload is realistic
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    images = jnp.asarray(
        (images - images.min()) / (images.max() - images.min()),
        jnp.float32)

    params = model.init(jax.random.PRNGKey(0), images[:1])

    @jax.jit
    def compress_step(params, images):
        out = model.apply(params, images)
        mu_raw, _ = split_model_output(out)
        mu = squash_mu(mu_raw) * edge_validity_masks(size, size)
        labels = jax.vmap(multicut_grid)(mu)
        stats = jax.vmap(lambda l: segment_stats_minlabel(l, 64))(labels)
        return labels, stats.counts

    # warmup/compile + full sync via scalar fetch (block_until_ready does not
    # reliably drain the queue on every backend; a host fetch of a scalar
    # depending on the outputs does)
    labels, counts = compress_step(params, images)
    float(jnp.sum(counts))

    n_iters = 5
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(n_iters):
        labels, counts = compress_step(params, images + 0.0001 * i)
        acc = acc + jnp.sum(counts).astype(jnp.float32)
    float(acc)  # waits for every queued step
    dt = (time.perf_counter() - t0) / n_iters

    images_per_sec = batch / dt
    print(json.dumps({
        "metric": "compress_images_per_sec_256px",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
