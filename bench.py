"""End-to-end compress benchmark on one chip.

Measures the FULL BASELINE.md compress pipeline — EdgeUNet forward + multicut
segmentation + segment stats + PNG-size estimation on device, plus host
slice-PNG encoding and writing (the per-image work of compress.cpp:93-153
including write_slices at :147) — in images/sec on batched 256x256 inputs.

Device and host run overlapped (device batch i+1 is dispatched while the host
slices batch i), which is how a production pipeline composes them; the
reference serializes the two. Labels travel device->host as uint16 (the
transfer relay fetches at ~32 MB/s, see CLAUDE.md). Slices are staged to a
RAM-backed directory (/dev/shm); BENCHMARKS.md reports the ext4 figure too.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}
vs_baseline is against the 500 img/s/chip v5e target from BASELINE.md (the
reference publishes no numbers). Supplementary keys report the device-only
rate and the host slice cost.
"""

import json
import os
import pathlib
import shutil
import tempfile
import time

import numpy as np


def make_images(batch, size, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish synthetic content so the multicut workload is realistic
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    return (images - images.min()) / (images.max() - images.min())


def main():
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.io.slicer import write_slices
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.edges import (edge_validity_masks,
                                                 split_model_output,
                                                 squash_mu)
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.png_estimator import \
        estimate_segment_png_sizes_fast
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel

    batch, size = 32, 256
    model = EdgeUNet()
    images_np = make_images(batch, size)
    images_u8 = (images_np * 255).astype(np.uint8)
    images = jnp.asarray(images_np, jnp.float32)

    params = model.init(jax.random.PRNGKey(0), images[:1])

    # Two XLA programs chained on device, not one: with the U-Net's convs
    # and the estimator in a single program, XLA's layout assignment ran the
    # estimator section ~8x slower than the same code compiled alone
    # (same effect, much larger, for multicut inside the RL megaprogram —
    # see train/steps.py::make_rl_step).
    @jax.jit
    def segment_program(params, images):
        out = model.apply(params, images)
        mu_raw, _ = split_model_output(out)
        mu = squash_mu(mu_raw) * edge_validity_masks(size, size)
        labels = jax.vmap(multicut_grid)(mu)
        # labels are smallest-pixel-index < 2^16 at 256x256: ship as uint16
        return labels.astype(jnp.uint16)

    @jax.jit
    def estimate_program(images, labels_u16):
        def stats_and_size(img, lab):
            stats = segment_stats_minlabel(lab, 64)
            rgba = jnp.concatenate(
                [(img * 255).astype(jnp.uint8),
                 jnp.full((size, size, 1), 255, jnp.uint8)], axis=-1)
            sizes = estimate_segment_png_sizes_fast(
                rgba, stats.inverse, stats.counts, stats.bboxes, stats.valid)
            return stats.counts, sizes

        return jax.vmap(stats_and_size)(images, labels_u16.astype(jnp.int32))

    def compress_step(params, images):
        labels_u16 = segment_program(params, images)
        counts, sizes = estimate_program(images, labels_u16)
        return labels_u16, counts, sizes

    def fetch(step_out):
        labels_u16, _counts, sizes = step_out
        return np.asarray(labels_u16).astype(np.int64), float(jnp.sum(sizes))

    def host_slice(labels_np, out_root, tag):
        for i in range(batch):
            write_slices(images_u8[i], labels_np[i], out_root, f"{tag}_{i}")

    staging = pathlib.Path("/dev/shm" if os.path.isdir("/dev/shm")
                           else tempfile.gettempdir()) / "bench_slices"
    shutil.rmtree(staging, ignore_errors=True)
    staging.mkdir(parents=True)

    # warmup/compile + full sync via scalar fetch (block_until_ready does not
    # reliably drain the queue on every backend; a host fetch depending on
    # the outputs does). The relay runs the FIRST ~5 executions of a program
    # 10-50x slower than steady state (CLAUDE.md), so warm with a full
    # throwaway round before timing.
    labels_np, _ = fetch(compress_step(params, images))
    host_slice(labels_np, staging, "warm")

    n_iters = 5

    def device_round():
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(n_iters):
            _lab, counts, sizes = compress_step(params, images + 0.0001 * i)
            acc = acc + jnp.sum(counts).astype(jnp.float32) + jnp.sum(sizes)
        float(acc)
        return (time.perf_counter() - t0) / n_iters

    device_round()                      # steady-state warm-up round
    dt_device = device_round()
    device_rate = batch / dt_device

    # host slice cost (per image, RAM-backed staging)
    t0 = time.perf_counter()
    host_slice(labels_np, staging, "host")
    host_ms_per_img = (time.perf_counter() - t0) / batch * 1000

    # full pipeline, overlapped: dispatch batch i+1, then slice batch i
    # while the device works
    def full_round():
        t0 = time.perf_counter()
        pending = compress_step(params, images)
        for i in range(n_iters):
            nxt = compress_step(params, images + 0.0001 * i)
            labels_np, _ = fetch(pending)  # waits for batch i only
            host_slice(labels_np, staging, f"it{i}")
            pending = nxt
        fetch(pending)
        return (time.perf_counter() - t0) / (n_iters + 1)

    full_round()                        # steady-state warm-up round
    dt_full = full_round()
    full_rate = batch / dt_full

    shutil.rmtree(staging, ignore_errors=True)
    print(json.dumps({
        "metric": "compress_e2e_images_per_sec_256px",
        "value": round(full_rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(full_rate / 500.0, 4),
        "device_pipeline_images_per_sec": round(device_rate, 2),
        "host_slice_ms_per_img": round(host_ms_per_img, 2),
    }))


if __name__ == "__main__":
    main()
