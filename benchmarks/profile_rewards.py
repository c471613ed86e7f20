"""Phase-level device profile of the reward stack (round-2 perf work).

Times segment stats, the bucketed estimator, and the estimator's internal
phases (filter costs, histogram/entropy, run-stat scans) separately on the
RL workload. Honest scalar-fetch sync (see CLAUDE.md). Run on the TPU.
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
    from image_compression_tpu.ops import png_estimator as pe
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.rewards import (compute_rewards_batched,
                                                   to_rgba_u8)
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel

    batch, size = 8, 256
    costs = make_costs(batch, size)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    sizes_b = jnp.full((batch,), 40000.0, jnp.float32)
    labels = jax.jit(jax.vmap(multicut_grid))(costs)
    print(f"devices: {jax.devices()}  batch={batch} size={size}")
    print("regions:", [int(len(np.unique(np.asarray(l)))) for l in labels][:4])

    f_rw = jax.jit(functools.partial(compute_rewards_batched, minlabel=True))
    t = timeit(f_rw, images, labels, sizes_b)
    print(f"rewards full        : {t*1000:8.2f} ms/batch  {t/batch*1000:7.2f} ms/img")

    stats_fn = jax.jit(jax.vmap(lambda l: segment_stats_minlabel(l, 64)))
    t_s = timeit(stats_fn, labels)
    print(f"segment stats       : {t_s*1000:8.2f} ms/batch")

    stats = stats_fn(labels)
    imgs_rgba = jax.jit(to_rgba_u8)(images)

    est = jax.jit(jax.vmap(functools.partial(
        pe.estimate_segment_png_sizes_fast)))
    t_e = timeit(est, imgs_rgba, stats.inverse, stats.counts, stats.bboxes,
                 stats.valid)
    print(f"estimator fast      : {t_e*1000:8.2f} ms/batch")

    # no-adaptive (skips the 5-filter cost pass, always Paeth)
    est_na = jax.jit(jax.vmap(functools.partial(
        pe.estimate_segment_png_sizes_fast, adaptive_filter=False)))
    t_na = timeit(est_na, imgs_rgba, stats.inverse, stats.counts,
                  stats.bboxes, stats.valid)
    print(f"  adaptive_filter=F : {t_na*1000:8.2f} ms/batch "
          f"(filter-cost pass ~{1000*(t_e-t_na):6.2f})")

    # phase isolation on the class-32 shape (64 slots of 32x32): time the
    # internal pieces on equivalent shapes
    cap, crop = 64, 32
    res = jnp.asarray(rng.integers(0, 256, (batch, cap, crop, crop, 4)),
                      jnp.int32)
    in_bbox = jnp.ones((batch, cap, crop, crop), bool)

    def hist_phase(res, in_bbox):
        chan = jax.lax.broadcasted_iota(jnp.int32, res.shape, res.ndim - 1)
        hist_key = chan * 256 + res
        flat_v = jnp.broadcast_to(in_bbox[..., None], res.shape)
        f = lambda k, v: jax.ops.segment_sum(  # noqa: E731
            v.reshape(-1).astype(jnp.float32), k.reshape(-1),
            num_segments=4 * 256)
        return jax.vmap(jax.vmap(f))(hist_key, flat_v)

    t_h = timeit(jax.jit(hist_phase), res, in_bbox)
    print(f"hist scatter (c32)  : {t_h*1000:8.2f} ms/batch")

    def hist_matmul(res, in_bbox):
        def one(r, m):
            oh = (r[..., None] ==
                  jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
            oh = oh * m[..., None, None].astype(jnp.bfloat16)
            return jnp.sum(oh.reshape(-1, 4, 256), axis=0, dtype=jnp.float32)
        return jax.vmap(jax.vmap(one))(res, in_bbox)

    t_hm = timeit(jax.jit(hist_matmul), res, in_bbox)
    print(f"hist one-hot (c32)  : {t_hm*1000:8.2f} ms/batch")

    def scan_phase(res, in_bbox):
        def one(r, m):
            flat_stream = jnp.broadcast_to(m[..., None], r.shape).reshape(-1)
            prev = jnp.concatenate([jnp.full((1,), -1, r.dtype),
                                    r.reshape(-1)[:-1]])
            flat_start = flat_stream & (r.reshape(-1) != prev)

            def seg_combine(op):
                def combine(x, y):
                    (vx, _rx), (vy, ry) = x, y
                    return jnp.where(ry, vy, op(vx, vy)), x[1] | ry
                return combine
            pos, _ = jax.lax.associative_scan(
                seg_combine(jnp.add),
                (flat_stream.astype(jnp.int32), flat_start))
            nxt, _ = jax.lax.associative_scan(
                seg_combine(lambda vx, _vy: vx),
                (jnp.where(flat_stream, flat_start, True), flat_stream),
                reverse=True)
            return jnp.sum(pos * nxt)
        return jax.vmap(jax.vmap(one))(res, in_bbox)

    t_sc = timeit(jax.jit(scan_phase), res, in_bbox)
    print(f"run scans (c32)     : {t_sc*1000:8.2f} ms/batch")


if __name__ == "__main__":
    main()
