"""High-resolution (1024^2) multicut: the spatial-scaling bench row.

The reference cannot exceed its fixed 256x256 RL grid (training.cpp:85-91);
this framework solves arbitrary power-of-two sizes single-chip and shards
one image's solve across a mesh (parallel/spatial.py::multicut_grid_spatial,
VERDICT round-2 next #6). Only one real TPU chip is reachable in this
environment, so this bench reports:

  * the REAL single-chip 1024^2 solve time (production profile), steady
    state, which is the per-device upper bound for the sharded path;
  * on a CPU mesh (--cpu-mesh): sharded-vs-unsharded label equality at
    1024^2 over 8 virtual devices, plus the strip-local work fraction
    (the share of pixel-space one-hot work that drops by n_devices when
    sharded; the coarse continuation is replicated).

Usage:
  PYTHONPATH=.:/root/.axon_site python benchmarks/bench_spatial.py
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=. python benchmarks/bench_spatial.py --cpu-mesh
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_costs(size, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(size // 16 + 1, size // 16 + 1, 3))
    img = np.kron(base, np.ones((16, 16, 1)))[:size, :size]
    img += 0.1 * rng.normal(size=img.shape)
    img = (img - img.min()) / (img.max() - img.min())
    dh = np.abs(np.diff(img, axis=1, append=img[:, -1:])).sum(-1)
    dv = np.abs(np.diff(img, axis=0, append=img[-1:, :])).sum(-1)
    return np.clip(np.stack([1.0 - 8.0 * dh, 1.0 - 8.0 * dv], -1),
                   -2, 2).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.multicut_hier import (default_caps,
                                                         lean_caps,
                                                         plan_levels)

    size = args.size
    mc = Config().multicut
    solve = functools.partial(multicut_grid, mode=mc.mode,
                              icm_sweeps=mc.icm_sweeps,
                              hier_rounds=tuple(mc.hier_rounds),
                              hier_caps=mc.hier_caps,
                              hier_agg=mc.hier_agg)
    costs = jnp.asarray(make_costs(size))

    if args.cpu_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from image_compression_tpu.parallel.mesh import make_mesh
        from image_compression_tpu.parallel.spatial import \
            multicut_grid_spatial

        mesh = make_mesh()
        n_dev = mesh.size
        expected = np.asarray(solve(costs))
        cs = jax.device_put(costs, NamedSharding(mesh, P("data")))
        got = np.asarray(multicut_grid_spatial(
            cs, mesh, mode=mc.mode,
            rounds_per_level=tuple(mc.hier_rounds), caps=mc.hier_caps,
            agg=mc.hier_agg))
        equal = bool(np.array_equal(got, expected))

        # strip-local fraction of pixel-space one-hot work: each level costs
        # ~ 2*H*W*S_level; levels with side <= H/n_dev shard n_dev-ways
        sides = plan_levels(size, size, 8)
        caps = (lean_caps(sides, mc.hier_caps) if mc.hier_caps
                else default_caps(sides))
        local = sum(c for s, c in zip(sides, caps) if s <= size // n_dev)
        total = sum(caps)
        print(json.dumps({
            "metric": "spatial_multicut_1024",
            "mode": "cpu_mesh_validation",
            "devices": n_dev,
            "labels_equal_unsharded": equal,
            "regions": int(len(np.unique(got))),
            "strip_local_work_fraction": round(local / total, 3),
        }))
        assert equal
        return

    # real-chip single-device timing, steady state (CLAUDE.md warm-up rule)
    jsolve = jax.jit(solve)

    def round_(iters=3):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for i in range(iters):
            lab = jsolve(costs + acc * 1e-12)
            acc = acc + jnp.sum(lab).astype(jnp.float32) * 1e-9
        float(acc)
        return (time.perf_counter() - t0) / iters

    float(jnp.sum(jsolve(costs)))   # compile
    round_()                        # steady-state warm-up
    dt = round_()
    lab = np.asarray(jsolve(costs))
    print(json.dumps({
        "metric": "spatial_multicut_1024",
        "mode": "single_chip",
        "solve_ms": round(dt * 1000, 2),
        "regions": int(len(np.unique(lab))),
        "equiv_256px_images_per_sec": round(16.0 / dt, 1),
    }))


if __name__ == "__main__":
    main()
