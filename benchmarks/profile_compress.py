"""Phase-level device profile of the compress step (round-2 perf work).

Times U-Net, multicut (and its internal knobs), and segment stats separately
on the bench workload with the honest scalar-fetch sync (CLAUDE.md:
block_until_ready does not drain the queue on this backend). Run on the TPU.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


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
    from benchmarks.profile_multicut import make_costs
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops import multicut as mc
    from image_compression_tpu.ops import multicut_hier as mh
    from image_compression_tpu.ops.edges import (edge_validity_masks,
                                                 split_model_output, squash_mu)
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel

    batch, size = 32, 256
    costs = make_costs(batch, size)
    print(f"devices: {jax.devices()}  batch={batch} size={size}")

    model = EdgeUNet()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1])

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    t = timeit(fwd, params, images)
    print(f"unet forward        : {t*1000:8.2f} ms/batch  {t/batch*1000:7.3f} ms/img")

    full = jax.jit(jax.vmap(mc.multicut_grid))
    t_full = timeit(full, costs)
    print(f"multicut full       : {t_full*1000:8.2f} ms/batch  {t_full/batch*1000:7.3f} ms/img")

    hier_only = jax.jit(jax.vmap(
        lambda c: mh.smallest_pixel_labels(mh.hier_gaec(c))))
    t_h = timeit(hier_only, costs)
    print(f"hier_gaec+labels    : {t_h*1000:8.2f} ms/batch  {t_h/batch*1000:7.3f} ms/img")

    for icm in (0, 2, 4, 8):
        f = jax.jit(jax.vmap(functools.partial(
            mc.multicut_grid, icm_sweeps=icm)))
        t_i = timeit(f, costs)
        print(f"multicut icm={icm:<2d}     : {t_i*1000:8.2f} ms/batch  {t_i/batch*1000:7.3f} ms/img")

    labels = full(costs)
    stats = jax.jit(jax.vmap(lambda l: segment_stats_minlabel(l, 64)))
    t_s = timeit(stats, labels)
    print(f"segment_stats_ml 64 : {t_s*1000:8.2f} ms/batch  {t_s/batch*1000:7.3f} ms/img")

    # marginal cost per hierarchy level: zero out rounds above level nl
    # (a 0-round level still pays its transition + compact pass)
    sides = mh.plan_levels(size, size, 8)
    full_rounds = [4, 3] + [2] * (len(sides) - 2)
    prev_t = None
    for nl in range(1, len(sides) + 1):
        rounds = full_rounds[:nl] + [0] * (len(sides) - nl)

        def run(c, _rounds=tuple(rounds)):
            r = mh.hier_gaec(c, rounds_per_level=list(_rounds))
            return r.rank_img
        f = jax.jit(jax.vmap(run))
        t_l = timeit(f, costs)
        marg = "" if prev_t is None else f" (marginal {1000*(t_l-prev_t):6.2f})"
        print(f"hier rounds<=lvl {sides[nl-1]:>3d}: {t_l*1000:8.2f} ms/batch{marg}")
        prev_t = t_l

    # objective/quality on this workload
    lab = np.asarray(labels)
    objs = [mc.multicut_objective(np.asarray(costs[i]), lab[i])
            for i in range(4)]
    print(f"objectives (first 4): {[round(o, 1) for o in objs]}")


if __name__ == "__main__":
    main()
