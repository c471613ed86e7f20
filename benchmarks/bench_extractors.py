"""Steady-state throughput of the classical extractors on TPU.

Round-1 numbers (Felzenszwalb 274 ms/img, SLIC 76 ms/img) were taken before
the relay's warm-up behavior was understood (CLAUDE.md): the first ~5
executions of a program run 10-50x slower than steady state. This bench
times a full throwaway round first.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def steady(fn, *args, iters=5):
    def round_():
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(iters):
            out = fn(*args)
            acc = acc + jnp.sum(out[0].astype(jnp.float32) if isinstance(
                out, tuple) else out.astype(jnp.float32))
        float(acc)
        return (time.perf_counter() - t0) / iters

    fn(*args)        # compile
    round_()         # steady-state warm-up
    return round_()


def main():
    from image_compression_tpu.config import EdgeTarget
    from image_compression_tpu.ops.targets import compute_edge_costs

    batch, size = 8, 256
    rng = np.random.default_rng(0)
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    images = jnp.asarray(
        (images - images.min()) / (images.max() - images.min()), jnp.float32)
    print(f"devices: {jax.devices()}  batch={batch} size={size}")

    for target in (EdgeTarget.CANNY, EdgeTarget.WATERSHED, EdgeTarget.SLIC,
                   EdgeTarget.GRAPH):
        f = jax.jit(lambda im, _t=target: compute_edge_costs(im, _t))
        t = steady(f, images)
        print(f"{target.value:10s}: {t*1000:8.2f} ms/batch "
              f"{t/batch*1000:7.2f} ms/img")


if __name__ == "__main__":
    main()
