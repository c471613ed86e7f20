"""Marginal-cost profile of the hierarchical multicut (round-3 perf work).

The relay's ~17-34 ms dispatch floor makes standalone micro-timings
meaningless (CLAUDE.md): every phase here is measured by repeating it K
times INSIDE one jitted program with a data dependency between repeats and
diffing 1x vs Kx wall time. Quality (objective + certified gap) is reported
next to every speed variant so tuning never trades correctness silently.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/profile_hier.py
"""

import functools
import time

import numpy as np


def make_costs(batch=8, size=256, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    images = (images - images.min()) / (images.max() - images.min())
    dh = np.abs(np.diff(images, axis=2, append=images[:, :, -1:])).sum(-1)
    dv = np.abs(np.diff(images, axis=1, append=images[:, -1:, :])).sum(-1)
    costs = np.stack([1.0 - 8.0 * dh, 1.0 - 8.0 * dv], axis=-1)
    return np.clip(costs, -2, 2).astype(np.float32)


def main():
    import argparse
    import sys

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.ops import multicut as mc
    from image_compression_tpu.ops import multicut_hier as mh

    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="phases,variants,full,noisy",
                    help="comma list: phases,variants,full,noisy")
    cli = ap.parse_args()
    sections = set(cli.sections.split(","))

    batch, size = 8, 256
    costs_np = make_costs(batch, size)
    costs = jnp.asarray(costs_np)
    print(f"devices: {jax.devices()}", flush=True)

    def marginal(make_fn, reps=(1, 5), iters=3):
        """Wall-clock marginal per repetition: build programs that run the
        target `r` times chained (output perturbs the next input), time both
        at steady state, diff."""
        times = {}
        for r in reps:
            fn = jax.jit(make_fn(r))
            # warm: full throwaway timing round (first ~5 execs are slow)
            for _ in range(2):
                float(jnp.sum(fn(costs)))
            t0 = time.perf_counter()
            for _ in range(iters):
                float(jnp.sum(fn(costs)))
            times[r] = (time.perf_counter() - t0) / iters
        r0, r1 = reps
        return (times[r1] - times[r0]) / (r1 - r0), times

    def chain_solve(solve):
        def make(r):
            def fn(c):
                acc = jnp.float32(0)
                for i in range(r):
                    lab = solve(c + acc * 1e-12)
                    acc = acc + jnp.sum(lab).astype(jnp.float32) * 1e-9
                return acc
            return fn
        return make

    def report(name, solve_batched, quality_labels=None):
        m, times = marginal(chain_solve(solve_batched))
        line = (f"{name:34s}: {m*1000:7.2f} ms/batch marginal "
                f"({m/batch*1000:6.3f} ms/img)  [1x {times[1]*1000:7.1f} "
                f"5x {times[5]*1000:7.1f}]")
        if quality_labels is not None:
            labs = np.asarray(quality_labels)
            objs = [mc.multicut_objective(costs_np[b], labs[b])
                    for b in range(batch)]
            ubs = [float(mc.multicut_upper_bound(costs[b]))
                   for b in range(batch)]
            gap = [(u - o) / abs(o) * 100 for o, u in zip(objs, ubs)]
            ks = [len(np.unique(labs[b])) for b in range(batch)]
            line += (f"  obj {np.mean(objs):12.1f}  gap {np.mean(gap):.4f}%"
                     f"  K~{np.mean(ks):.0f}")
        print(line, flush=True)

    def hier_only(mode="chain", base=8, rpl=None, caps=None):
        def one(c):
            res = mh.hier_gaec(c, mode=mode, base=base,
                               rounds_per_level=rpl, caps=caps)
            return mh.smallest_pixel_labels(res)
        return jax.vmap(one)

    if "phases" in sections:
        # ---- baseline full solve + phase marginals --------------------------
        full = jax.vmap(functools.partial(mc.multicut_grid))
        report("full solve (default)", full, full(costs))

        h = hier_only()
        report("hier+smallest_pixel (no icm)", h, h(costs))

        # hier WITHOUT the smallest_pixel relabel (globalize ids instead)
        def hier_gl(c):
            res = mh.hier_gaec(c)
            return mh.globalize(res, size, size)
        hg = jax.vmap(hier_gl)
        report("hier+globalize (no relabel)", hg)

        labs0 = h(costs)

        def icm_make(r):
            def fn(c):
                lab = labs0
                acc = jnp.float32(0)
                for _ in range(r):
                    lab = jax.vmap(lambda l, cc: mc._icm_refine(l, cc, 8))(
                        lab, c + acc * 1e-12)
                    acc = acc + jnp.sum(lab).astype(jnp.float32) * 1e-9
                return acc
            return fn
        m, _ = marginal(icm_make)
        print(f"{'icm8':34s}: {m*1000:7.2f} ms/batch marginal "
              f"({m/batch*1000:6.3f} ms/img)")

        def rel_make(r):
            def fn(c):
                lab = labs0
                acc = jnp.float32(0)
                for _ in range(r):
                    lab = jax.vmap(mc.relabel_connected)(
                        lab + (acc * 0).astype(lab.dtype))
                    acc = acc + jnp.sum(lab).astype(jnp.float32) * 1e-9
                return acc
            return fn
        m, _ = marginal(rel_make)
        print(f"{'relabel_connected':34s}: {m*1000:7.2f} ms/batch marginal "
              f"({m/batch*1000:6.3f} ms/img)")

    # ---- variants -----------------------------------------------------------
    variants = [] if "variants" not in sections else [
        ("base=4", dict(base=4)),
        ("rpl=[2,1,1,...]", dict(rpl=[2, 1, 1, 1, 1, 1])),
        ("rpl=[2,2,1,...]", dict(rpl=[2, 2, 1, 1, 1, 1])),
        ("caps half", dict(caps="half")),
        ("caps flat64", dict(caps="flat64")),
        ("base=4+caps half", dict(base=4, caps="half")),
        ("rpl211+caps half", dict(rpl=[2, 1, 1, 1, 1, 1], caps="half")),
        ("rpl211+caps flat64", dict(rpl=[2, 1, 1, 1, 1, 1], caps="flat64")),
        ("rpl221+caps flat64", dict(rpl=[2, 2, 1, 1, 1, 1], caps="flat64")),
    ]
    for name, kw in variants:
        base = kw.get("base", 8)
        sides_v = mh.plan_levels(size, size, base)
        caps_kw = kw.get("caps")
        if caps_kw == "half":
            caps = [c if i == 0 else max(32, c // 2)
                    for i, c in enumerate(mh.default_caps(sides_v))]
        elif caps_kw == "flat64":
            caps = [c if i == 0 else 64
                    for i, c in enumerate(mh.default_caps(sides_v))]
        else:
            caps = None
        rpl = kw.get("rpl")
        if rpl is not None:
            rpl = rpl[:len(sides_v)]
            if len(rpl) < len(sides_v):
                rpl = rpl + [rpl[-1]] * (len(sides_v) - len(rpl))
        hv = hier_only(base=base, rpl=rpl, caps=caps)
        report(f"hier {name}", hv, hv(costs))
        ov = jax.vmap(lambda c: mh.hier_gaec(
            c, base=base, rounds_per_level=rpl, caps=caps).overflow)(costs)
        tot_ov = int(jnp.sum(ov))
        if tot_ov:
            print(f"    ^ froze {tot_ov} regions across the batch")

    # ---- full-path candidate defaults (end-to-end, labels contract) --------
    if "full" not in sections and "noisy" not in sections:
        return
    print("\n-- full multicut_grid paths (candidate compress defaults) --",
          flush=True)
    full_variants = [
        ("default (icm8)", dict()),
        ("icm0 (no relabel)", dict(icm_sweeps=0)),
        ("rpl211+half icm8", dict(hier_rounds=(2, 1, 1, 1, 1, 1),
                                  hier_caps="half")),
        ("rpl211+half icm0", dict(hier_rounds=(2, 1, 1, 1, 1, 1),
                                  hier_caps="half", icm_sweeps=0)),
        ("rpl211+flat64 icm0", dict(hier_rounds=(2, 1, 1, 1, 1, 1),
                                    hier_caps="flat64", icm_sweeps=0)),
        ("half icm0", dict(hier_caps="half", icm_sweeps=0)),
        ("half icm2", dict(hier_caps="half", icm_sweeps=2)),
        ("rpl211+half icm0 MATRIX", dict(hier_rounds=(2, 1, 1, 1, 1, 1),
                                         hier_caps="half", icm_sweeps=0,
                                         hier_agg="matrix")),
        ("rpl211+flat64 icm0 MATRIX", dict(hier_rounds=(2, 1, 1, 1, 1, 1),
                                           hier_caps="flat64", icm_sweeps=0,
                                           hier_agg="matrix")),
    ]
    # one jitted callable per variant, shared by timing and noisy sections
    # (a fresh vmap closure per call would recompile the identical program)
    compiled = {name: jax.vmap(functools.partial(mc.multicut_grid, **kw))
                for name, kw in full_variants}
    if "full" in sections:
        for name, _ in full_variants:
            fv = compiled[name]
            report(f"full {name}", fv, fv(costs))

    # ---- noisy (RL sampled-policy-like) workload: quality under noise ------
    if "noisy" not in sections:
        return
    print("\n-- noisy workload (sampled-policy-like costs) --", flush=True)
    rng = np.random.default_rng(7)
    noisy_np = (costs_np + rng.normal(scale=0.6, size=costs_np.shape)
                ).astype(np.float32)
    noisy = jnp.asarray(noisy_np)

    def nreport(name, solve_batched):
        labs = np.asarray(solve_batched(noisy))
        objs = [mc.multicut_objective(noisy_np[b], labs[b])
                for b in range(batch)]
        ubs = [float(mc.multicut_upper_bound(noisy[b])) for b in range(batch)]
        gap = [(u - o) / abs(o) * 100 for o, u in zip(objs, ubs)]
        ks = [len(np.unique(labs[b])) for b in range(batch)]
        print(f"{name:34s}: obj {np.mean(objs):12.1f}  "
              f"gap {np.mean(gap):.4f}%  K~{np.mean(ks):.0f}", flush=True)

    for name, _ in full_variants:
        nreport(f"noisy {name}", compiled[name])


if __name__ == "__main__":
    main()
