"""Batch-scaling profile of the production multicut (round-3 tail work).

NOTES_R3 flagged a gap between the solver's marginal cost at batch 8
(0.70 ms/img) and its standalone wall at batch 128 (~1.8 ms/img). This
script localizes it: the production profile (matrix agg + flat64 caps +
rounds (2,1) + icm0) is timed at several batch sizes with the marginal
in-jit repetition method (CLAUDE.md: the relay's 17-34 ms dispatch floor
and 5-execution warm-up make naive timings meaningless), and the matrix
hierarchy is additionally timed LEVEL BY LEVEL at the largest batch by
re-driving the library internals with a truncated level plan.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/profile_batch.py
"""

import argparse
import functools
import time

import numpy as np

from benchmarks.profile_hier import make_costs


def main():
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.ops import multicut as mc
    from image_compression_tpu.ops import multicut_hier as mh

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--sections", default="scaling,levels")
    args = ap.parse_args()
    sections = set(args.sections.split(","))
    size = args.size
    batches = [int(b) for b in args.batches.split(",")]

    print(f"devices: {jax.devices()}", flush=True)

    costs_by_b = {}
    for b in batches:
        costs_by_b[b] = jnp.asarray(
            np.concatenate([make_costs(8, size, seed=s)
                            for s in range((b + 7) // 8)])[:b])

    def marginal(make_fn, costs, reps=(1, 5), iters=3):
        times = {}
        for r in reps:
            fn = jax.jit(make_fn(r))
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
                for _ in range(r):
                    lab = solve(c + acc * 1e-12)
                    acc = acc + jnp.sum(lab).astype(jnp.float32) * 1e-9
                return acc
            return fn
        return make

    variants = {
        "fused": jax.vmap(functools.partial(
            mc.multicut_grid, hier_rounds=(2, 1), hier_caps="flat64",
            icm_sweeps=0, hier_agg="matrix", hier_leaf="fused")),
        "matrix": jax.vmap(functools.partial(
            mc.multicut_grid, hier_rounds=(2, 1), hier_caps="flat64",
            icm_sweeps=0, hier_agg="matrix", hier_leaf="xla")),
        "pixel": jax.vmap(functools.partial(
            mc.multicut_grid, hier_rounds=(2, 1), hier_caps="flat64",
            icm_sweeps=0, hier_agg="pixel")),
    }

    if "scaling" in sections:
        print("\n-- production profile batch scaling (marginal) --", flush=True)
        for name, fn in variants.items():
            for b in batches:
                m, times = marginal(chain_solve(fn), costs_by_b[b])
                print(f"{name:7s} b={b:4d}: {m*1000:8.2f} ms/batch marginal "
                      f"({m/b*1000:6.3f} ms/img)  "
                      f"[1x wall {times[1]*1000:7.1f} ms = "
                      f"{times[1]/b*1000:6.3f} ms/img]", flush=True)

    if "chunked" in sections:
        # Round-4 candidate for the b128 scaling gap (NOTES_R3 #6): if the
        # large-batch slowdown is working-set pressure (every level's
        # one-hot/rank temporaries live for all 128 images at once under
        # vmap), serializing the batch into lax.map chunks should recover
        # the small-batch marginal at the cost of chunk-count sequencing.
        b = batches[-1]
        costs = costs_by_b[b]
        base = variants["pixel"]
        print(f"\n-- batch-chunked pixel path, b={b} --", flush=True)
        m_full, _ = marginal(chain_solve(base), costs)
        print(f"chunk=none: {m_full/b*1000:6.3f} ms/img marginal", flush=True)
        for chunk in (8, 16, 32, 64):
            def solve(c, chunk=chunk):
                r = c.reshape(b // chunk, chunk, *c.shape[1:])
                return jax.lax.map(base, r).reshape(b, size, size)
            m, _ = marginal(chain_solve(solve), costs)
            print(f"chunk={chunk:4d}: {m/b*1000:6.3f} ms/img marginal",
                  flush=True)

    if "levels" not in sections:
        return

    # ---- per-level marginal at the largest batch ---------------------------
    # Re-drive the matrix hierarchy with a truncated plan: levels [0, L).
    # The diff of consecutive L isolates each level's cost (transition +
    # rounds + slot-map apply). Mirrors _hier_gaec_matrix's loop exactly.
    b = batches[-1]
    costs = costs_by_b[b]
    sides = mh.plan_levels(size, size, 8)
    caps = mh.lean_caps(sides, "flat64")
    rpl = [2, 1] + [1] * (len(sides) - 2)
    sentinel = float(size * size)

    def run_levels(nlev):
        def one(costs_hw2):
            costs_f32 = costs_hw2.astype(jnp.float32)
            height, width = costs_f32.shape[:2]
            s0, slots0 = sides[0], int(caps[0])
            ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
            rank_img = (ys % s0) * s0 + (xs % s0)
            frozen = jnp.zeros((height, width), bool)
            final_gid = jnp.zeros((height, width), jnp.int32)
            overflow = jnp.int32(0)
            sym = mh._pair_from_pixels(rank_img, costs_f32, s0, slots0)
            m = mh._to_tiles(ys * width + xs, s0).astype(jnp.float32)
            sym, m, cmap, ncand = mh._matrix_rounds(
                sym, m, slots0, rpl[0], "chain", 0, sentinel)
            rank_img = mh._apply_slot_map(rank_img, cmap, s0, slots0)
            for i in range(1, nlev):
                s, slots = sides[i], int(caps[i])
                (rank_img, sym, m, frozen, final_gid,
                 overflow) = mh._matrix_transition(
                    rank_img, ncand, sym, m, frozen, final_gid, overflow,
                    costs_f32, sides[i - 1], int(caps[i - 1]), s, slots)
                sym, m, cmap, ncand = mh._matrix_rounds(
                    sym, m, slots, rpl[i], "chain", 1000 * i, sentinel)
                rank_img = mh._apply_slot_map(rank_img, cmap, s, slots)
            return rank_img + final_gid  # consume both outputs
        return jax.vmap(one)

    print(f"\n-- per-level marginal, b={b} (cumulative plans) --", flush=True)
    prev = 0.0
    for nlev in range(1, len(sides) + 1):
        mcost, _ = marginal(chain_solve(run_levels(nlev)), costs)
        print(f"levels[0:{nlev}] (top side {sides[nlev-1]:4d}): "
              f"{mcost*1000:8.2f} ms/batch  "
              f"(+{(mcost-prev)*1000:7.2f} for level {nlev-1}; "
              f"{mcost/b*1000:6.3f} ms/img cumulative)", flush=True)
        prev = mcost

    # the final labeling step (smallest_pixel_labels via minpix lookup)
    def full_with_labels():
        def one(c):
            res = mh.hier_gaec(c, rounds_per_level=rpl, caps=caps,
                               agg="matrix")
            return mh.smallest_pixel_labels(res)
        return jax.vmap(one)
    mcost, _ = marginal(chain_solve(full_with_labels()), costs)
    print(f"hier + smallest_pixel_labels:  {mcost*1000:8.2f} ms/batch "
          f"({mcost/b*1000:6.3f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
