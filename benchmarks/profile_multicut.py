"""Phase-level device profile of the multicut solver (round-2 perf work).

Times each phase of multicut_grid separately on the bench workload with the
honest scalar-fetch sync (CLAUDE.md: block_until_ready does not drain the
queue on this backend). Run on the TPU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_costs(batch=8, size=256, seed=0):
    """Same flavor of workload as bench.py: smooth blocks + noise -> signed
    costs in [-2, 2] from a proxy 'model' (difference-based)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    images = (images - images.min()) / (images.max() - images.min())
    # proxy costs: positive where neighbors similar, negative across steps
    dh = np.abs(np.diff(images, axis=2, append=images[:, :, -1:])).sum(-1)
    dv = np.abs(np.diff(images, axis=1, append=images[:, -1:, :])).sum(-1)
    costs = np.stack([1.0 - 8.0 * dh, 1.0 - 8.0 * dv], axis=-1)
    return jnp.asarray(np.clip(costs, -2, 2), jnp.float32)


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    accs = []
    for _ in range(iters):
        out = fn(*args)
        accs.append(jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)), out))
    jax.tree_util.tree_map(lambda x: float(x), accs)
    return (time.perf_counter() - t0) / iters


def main():
    import functools

    from image_compression_tpu.ops import multicut as mc
    from image_compression_tpu.ops import multicut_tiles as mt

    batch, size = 8, 256
    costs = make_costs(batch, size)
    print(f"devices: {jax.devices()}")

    # --- full solve ---
    full = jax.jit(jax.vmap(functools.partial(mc.multicut_grid)))
    t = timeit(full, costs)
    print(f"full solve          : {t*1000:8.2f} ms/batch  {t/batch*1000:7.2f} ms/img")

    # --- presolve only ---
    pre = jax.jit(jax.vmap(functools.partial(mt.tile_presolve, tile=16, rounds=4)))
    t_pre = timeit(pre, costs)
    print(f"tile presolve       : {t_pre*1000:8.2f} ms/batch")

    # --- presolve + boundary (no full rounds, no icm/relabel) ---
    f = jax.jit(jax.vmap(functools.partial(
        mc.multicut_grid, max_rounds=0, icm_sweeps=0)))
    t_pb = timeit(f, costs)
    print(f"presolve+boundary   : {t_pb*1000:8.2f} ms/batch")

    # --- + k full rounds ---
    prev = t_pb
    for k in (1, 2, 3):
        f = jax.jit(jax.vmap(functools.partial(
            mc.multicut_grid, max_rounds=k, icm_sweeps=0)))
        t_k = timeit(f, costs)
        print(f"+{k} full rounds      : {t_k*1000:8.2f} ms/batch "
              f"(marginal {1000*(t_k-prev):6.2f})")
        prev = t_k

    # --- icm + relabel marginal ---
    f = jax.jit(jax.vmap(functools.partial(mc.multicut_grid, icm_sweeps=8)))
    t_icm = timeit(f, costs)
    print(f"+icm8+relabel       : {t_icm*1000:8.2f} ms/batch "
          f"(marginal {1000*(t_icm-prev):6.2f})")

    # --- microbenches ---
    n = size * size
    e = 2 * n
    key = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, (batch, e),
                                                        dtype=np.uint32))
    val = jnp.asarray(np.random.default_rng(1).random((batch, e), np.float32))

    sort1 = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
    t_sort = timeit(sort1, key, val)
    print(f"one-key sort 2n     : {t_sort*1000:8.2f} ms/batch")

    idx = jnp.asarray(np.random.default_rng(2).integers(0, n, (batch, 2 * e),
                                                        dtype=np.int32))
    vals2 = jnp.asarray(np.random.default_rng(3).random((batch, 2 * e),
                                                        np.float32))
    segmax = jax.jit(jax.vmap(
        lambda v, i: jax.ops.segment_max(v, i, num_segments=n)))
    t_sm = timeit(segmax, vals2, idx)
    print(f"segment_max 4n->n   : {t_sm*1000:8.2f} ms/batch")

    scan_in = (val, key % 2 == 0)

    def segscan(v, r):
        def combine(x, y):
            (vx, _), (vy, ry) = x, y
            return jnp.where(ry, vy, vx + vy), x[1] | ry
        return jax.lax.associative_scan(combine, (v, r), axis=1)[0]

    t_scan = timeit(jax.jit(segscan), *scan_in)
    print(f"assoc scan 2n       : {t_scan*1000:8.2f} ms/batch")

    # gather cost: root[idx] for 16k unsorted indices
    root = jnp.asarray(np.arange(n, dtype=np.int32))[None].repeat(batch, 0)
    idx16 = idx[:, :16384]
    gather = jax.jit(jax.vmap(lambda r, i: r[i]))
    t_g = timeit(gather, root, idx16)
    print(f"gather 16k from n   : {t_g*1000:8.2f} ms/batch")

    # relabel alone
    labels = full(costs)
    rel = jax.jit(jax.vmap(mc.relabel_connected))
    t_rel = timeit(rel, labels)
    print(f"relabel_connected   : {t_rel*1000:8.2f} ms/batch")

    # distinct regions after each stage (workload realism check)
    lab_pb = jax.jit(jax.vmap(functools.partial(
        mc.multicut_grid, max_rounds=0, icm_sweeps=0)))(costs)
    for name, lab in (("presolve+boundary", lab_pb), ("full", labels)):
        ks = [int(len(np.unique(np.asarray(l)))) for l in lab]
        print(f"regions after {name:18s}: {ks}")


if __name__ == "__main__":
    main()
