"""Benchmark suite over the BASELINE.json configurations.

Each entry prints one JSON line. Run on-device:
  PYTHONPATH=. python benchmarks/bench_suite.py [--quick]
"""

import argparse
import json
import time

import numpy as np


def timed(fn, *args, iters=3):
    """block_until_ready does not reliably drain the queue on every backend;
    chain all outputs into one scalar host fetch instead. A FULL timing
    round runs as a throwaway first: the relay executes the first ~5 runs
    of a compiled program 10-50x slower than steady state (CLAUDE.md), so
    a single warm-up call measures almost pure warm-up."""
    import jax
    import jax.numpy as jnp

    def scalar(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(leaf).astype(jnp.float32) for leaf in leaves)

    def round_():
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            acc = acc + scalar(fn(*args))
        float(acc)
        return (time.perf_counter() - t0 - 0.026) / iters

    float(scalar(fn(*args)))   # compile
    round_()                   # steady-state warm-up round
    return round_()


def synthetic_batch(batch, size, rng):
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    images = (images - images.min()) / (images.max() - images.min())
    return images.astype(np.float32)


def bench_classical_extractors(batch, size, rng):
    """BASELINE config #2: batched classical edge-feature extraction."""
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.ops.canny import canny_edge_costs
    from image_compression_tpu.ops.slic import slic_edge_costs
    from image_compression_tpu.ops.watershed import watershed_edge_costs

    images = jnp.asarray(synthetic_batch(batch, size, rng))
    out = {}
    for name, fn in [("canny", canny_edge_costs), ("slic", slic_edge_costs),
                     ("watershed", watershed_edge_costs)]:
        dt = timed(jax.jit(fn), images)
        out[name] = batch / dt
    return out


def bench_inference(batch, size, rng):
    """BASELINE config #3: U-Net inference + multicut segmentation."""
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.edges import (edge_validity_masks,
                                                 split_model_output, squash_mu)
    from image_compression_tpu.ops.multicut import multicut_grid

    model = EdgeUNet()
    images = jnp.asarray(synthetic_batch(batch, size, rng))
    params = model.init(jax.random.PRNGKey(0), images[:1])

    @jax.jit
    def forward_only(params, images):
        return model.apply(params, images)

    @jax.jit
    def full(params, images):
        out = model.apply(params, images)
        mu_raw, _ = split_model_output(out)
        mu = squash_mu(mu_raw) * edge_validity_masks(size, size)
        return jax.vmap(multicut_grid)(mu)

    return {"unet_forward": batch / timed(forward_only, params, images),
            "unet_multicut": batch / timed(full, params, images)}


def bench_rl_step(batch, size, rng):
    """BASELINE config #5: full REINFORCE step (policy + multicut + reward)."""
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.train.steps import (init_rl_state,
                                                   make_rl_optimizer,
                                                   make_rl_step)

    cfg = Config()
    model = EdgeUNet()
    images = jnp.asarray(synthetic_batch(batch, size, rng))
    sizes = jnp.full((batch,), 120_000.0)
    params = model.init(jax.random.PRNGKey(0), images[:1])
    tx = make_rl_optimizer(cfg)
    state = init_rl_state(params, tx)
    step = make_rl_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    dt = timed(lambda s: step(s, key, images, sizes)[0], state)
    return {"rl_step": batch / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    batch = 8 if args.quick else 16
    size = 256

    results = {}
    results.update({f"extract_{k}_imgs_per_sec": round(v, 2)
                    for k, v in bench_classical_extractors(
                        batch, size, rng).items()})
    results.update({f"{k}_imgs_per_sec": round(v, 2)
                    for k, v in bench_inference(batch, size, rng).items()})
    results.update({f"{k}_imgs_per_sec": round(v, 2)
                    for k, v in bench_rl_step(batch, size, rng).items()})
    for key, value in results.items():
        print(json.dumps({"metric": key, "value": value,
                          "unit": "images/sec"}))


if __name__ == "__main__":
    main()
