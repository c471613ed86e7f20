"""End-to-end compress benchmark on one chip.

Measures the FULL BASELINE.md compress pipeline — EdgeUNet forward + multicut
segmentation + segment stats + PNG-size estimation on device, plus host
slice-PNG encoding and writing (the per-image work of compress.cpp:93-153
including write_slices at :147) — in images/sec on batched 256x256 inputs.

The headline workload runs the TRAINED round-3 checkpoint
(artifacts/fcn_pretrained_r3_best_params), matching how the reference
compresses (compress.cpp:102 loads its trained checkpoint); a random-init
row is kept as a segment-heavy stress case, and the device pipeline is
reported at batch 32 and 128 (the relay's 17-34 ms/program dispatch floor
is ~1 ms/img at batch 32, a quarter of that at 128 — CLAUDE.md). The timed
estimator uses workload-derived crop-class caps measured from the warmup
batch's real labels (the production setting for a known deployment
workload); spill semantics keep a cap miss graceful, never wrong.

Device and host run overlapped (device batch i+1 is dispatched while the host
slices batch i), which is how a production pipeline composes them; the
reference serializes the two. Labels travel device->host as uint16 (the
transfer relay fetches at ~32 MB/s, see CLAUDE.md). Slices are staged to a
RAM-backed directory (/dev/shm); BENCHMARKS.md reports the ext4 figure too.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N, ...}
vs_baseline is against the 500 img/s/chip v5e target from BASELINE.md (the
reference publishes no numbers). Supplementary keys report per-batch-size
device rates, the random-weights stress rates, slices/img for both
workloads, and the host slice cost.
"""

import json
import os
import pathlib
import shutil
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
CKPT = REPO / "artifacts" / "fcn_pretrained_r3_best_params"


def make_images(batch, size, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish synthetic content so the multicut workload is realistic
    base = rng.normal(size=(batch, size // 16 + 1, size // 16 + 1, 3))
    images = np.kron(base, np.ones((1, 16, 16, 1)))[:, :size, :size]
    images += 0.1 * rng.normal(size=images.shape)
    return (images - images.min()) / (images.max() - images.min())


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.ops.edges import (edge_validity_masks,
                                                 split_model_output,
                                                 squash_mu)
    from image_compression_tpu.ops.multicut import multicut_grid
    from image_compression_tpu.ops.png_estimator import \
        estimate_segment_png_sizes_packed
    from image_compression_tpu.ops.segment_stats import segment_stats_minlabel
    from image_compression_tpu.train.checkpoint import load_params

    size = 256
    model = EdgeUNet()

    params_random = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3), jnp.float32))
    if CKPT.exists():
        params_trained = load_params(CKPT, template=params_random)
        trained_available = True
    else:                                       # fresh clone without artifacts
        params_trained = params_random
        trained_available = False

    # Two XLA programs chained on device, not one: with the U-Net's convs
    # and the estimator in a single program, XLA's layout assignment ran the
    # estimator section ~8x slower than the same code compiled alone
    # (same effect, much larger, for multicut inside the RL megaprogram —
    # see train/steps.py::make_rl_step).
    # production solver profile (config.py MulticutConfig defaults): lean
    # hierarchy + no ICM, 1.5 ms/img at 0.014% certified gap — labels stay
    # minlabel-contract (frozen regions carry smallest-pixel ids too)
    mc = Config().multicut
    solve = functools.partial(multicut_grid, mode=mc.mode,
                              icm_sweeps=mc.icm_sweeps,
                              hier_rounds=tuple(mc.hier_rounds),
                              hier_caps=mc.hier_caps,
                              hier_agg=mc.hier_agg)

    from image_compression_tpu.ops.labels_wire import pack_connectivity

    @jax.jit
    def segment_program(params, images):
        out = model.apply(params, images)
        mu_raw, _ = split_model_output(out)
        mu = squash_mu(mu_raw) * edge_validity_masks(size, size)
        labels = jax.vmap(solve)(mu)
        # device->host wire: 2-bit/pixel packed connectivity planes
        # (ops/labels_wire.py) instead of round-3's uint16 label maps —
        # 16 KB/img vs 128 KB through the ~32 MB/s fetch relay. The labels
        # themselves stay on device for the estimator program; the host
        # reconstructs exact minlabel ids natively (pngio_labels_from_conn).
        hbits, vbits = pack_connectivity(labels)
        return labels.astype(jnp.uint16), hbits, vbits

    def make_estimate_program(class_caps):
        """class_caps are BATCH TOTALS per crop class: the packed estimator
        pools slot capacity across the batch (the expensive full-image crop
        class averages ~3 segments/img but peaks at ~6, so per-image caps
        compute ~2x padding slots at full crop cost — ops/png_estimator.py
        ::estimate_segment_png_sizes_packed)."""
        @jax.jit
        def estimate_program(images, labels_u16):
            stats = jax.vmap(lambda lab: segment_stats_minlabel(lab, 64))(
                labels_u16.astype(jnp.int32))
            rgba = jnp.concatenate(
                [(images * 255).astype(jnp.uint8),
                 jnp.full(images.shape[:3] + (1,), 255, jnp.uint8)], axis=-1)
            sizes = estimate_segment_png_sizes_packed(
                rgba, stats.inverse, stats.counts, stats.bboxes,
                stats.valid, class_caps=class_caps)
            return stats.counts, sizes
        return estimate_program

    def derive_class_caps(labels_np, k_max=64):
        """Workload-derived estimator crop caps (VERDICT r2 next #8), as
        BATCH TOTALS for the packed estimator: count segments per bbox-side
        class over the warmup batch's real labels and add a 10% + 8 margin.
        Spill semantics make a too-tight cap degrade gracefully (larger
        crop class first, literal-only bound last), so the margin only
        guards exactness, not correctness. Class grid must match the
        estimator for 256px inputs: sides (32, 64, 128) + full image."""
        class_sizes = (32, 64, 128, 256)
        total = [0, 0, 0, 0]
        for lab in labels_np:
            for lab_id in np.unique(lab):
                ys, xs = np.nonzero(lab == lab_id)
                side = max(ys.max() - ys.min(), xs.max() - xs.min()) + 1
                for c, s in enumerate(class_sizes):
                    if side <= s:
                        total[c] += 1
                        break
        batch = len(labels_np)
        return tuple(min(batch * k_max, t + max(8, t // 10)) for t in total)

    def make_compress_step(estimate_program):
        def compress_step(params, images):
            labels_u16, hbits, vbits = segment_program(params, images)
            counts, sizes = estimate_program(images, labels_u16)
            return hbits, vbits, counts, sizes
        return compress_step

    def fetch(step_out):
        hbits, vbits, _counts, sizes = step_out
        return np.asarray(hbits), np.asarray(vbits), float(jnp.sum(sizes))

    # Pre-staged distinct inputs + ONE sync program per timing round: the
    # naive loop's `images + 0.0001*i` bump and per-iter `jnp.sum`
    # accumulator are each their OWN dispatched programs (~20 ms floor each
    # through the relay, CLAUDE.md) — 2 extra floors per iteration that a
    # production pipeline never pays. The timed loop below dispatches
    # exactly the pipeline's programs per batch; one chained-sum program at
    # the end syncs the whole round.
    _bump = jax.jit(lambda x, c: x + c)

    def make_round_inputs(images_dev, n_iters):
        xs = [_bump(images_dev, jnp.float32(1e-4 * i))
              for i in range(n_iters)]
        float(jnp.sum(xs[-1][0, 0, 0]))   # stage before timing
        return xs

    @jax.jit
    def _sync_sum(outs):
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for out in outs for leaf in jax.tree.leaves(out))

    def device_rate(compress_step, params, images_dev, batch, n_iters=5):
        """Steady-state device-pipeline rate: one full throwaway timing
        round first (the relay runs the first ~5 executions of a program
        10-50x slower than steady state, CLAUDE.md), then measure."""
        xs = make_round_inputs(images_dev, n_iters)

        def round_():
            t0 = time.perf_counter()
            outs = [compress_step(params, x) for x in xs]
            float(_sync_sum(outs))
            return (time.perf_counter() - t0) / n_iters

        round_()                         # steady-state warm-up round
        return batch / round_()

    staging = pathlib.Path("/dev/shm" if os.path.isdir("/dev/shm")
                           else tempfile.gettempdir()) / "bench_slices"
    shutil.rmtree(staging, ignore_errors=True)
    staging.mkdir(parents=True)

    results = {}
    slices_per_img = {}
    labels_by_workload = {}
    batch_head = 128
    images_head_np = make_images(batch_head, size)
    images_head_u8 = (images_head_np * 255).astype(np.uint8)
    images_head = jnp.asarray(images_head_np, jnp.float32)
    images_32 = images_head[:32]

    caps_by_workload = {}
    steps_by_workload = {}
    for name, params in (("trained", params_trained),
                         ("random_weights", params_random)):
        # warmup/compile + full sync via scalar fetch (block_until_ready
        # does not reliably drain the queue on this backend; a host fetch
        # depending on the outputs does). Labels alone determine the caps,
        # so the warmup runs the parity program only.
        warm_labels, warm_hb, warm_vb = segment_program(params, images_head)
        labels_np = np.asarray(warm_labels).astype(np.int64)
        labels_by_workload[name] = labels_np
        if name == "trained":
            wire_by_trained = (np.asarray(warm_hb), np.asarray(warm_vb))
        slices_per_img[name] = float(np.mean(
            [len(np.unique(l)) for l in labels_np]))
        # the timed program uses workload-derived estimator crop caps, the
        # production configuration for a known deployment workload; packed
        # caps are batch totals, so each batch size derives its own
        caps = derive_class_caps(labels_np)
        caps_by_workload[name] = caps
        step = make_compress_step(make_estimate_program(caps))
        steps_by_workload[name] = step
        step32 = make_compress_step(
            make_estimate_program(derive_class_caps(labels_np[:32])))
        results[f"device_b128_{name}"] = device_rate(
            step, params, images_head, batch_head)
        results[f"device_b32_{name}"] = device_rate(
            step32, params, images_32, 32)

    # Reference-parity device pipeline: the reference's compress binary runs
    # U-Net -> multicut -> host slicing ONLY (compress.cpp:93-153 never calls
    # the estimator; that is RL-reward machinery, compute_rewards.cu). The
    # stats+estimator rows above are the EXTENDED pipeline (size prediction
    # on device); this row times what compress actually does.
    def parity_rate(params, images_dev, batch, n_iters=5):
        xs = make_round_inputs(images_dev, n_iters)

        def round_():
            t0 = time.perf_counter()
            outs = [segment_program(params, x) for x in xs]
            float(_sync_sum(outs))
            return (time.perf_counter() - t0) / n_iters

        round_()                         # steady-state warm-up round
        return batch / round_()

    results["device_parity_b128_trained"] = parity_rate(
        params_trained, images_head, batch_head)
    results["device_parity_b32_trained"] = parity_rate(
        params_trained, images_32, 32)

    # host slice cost (per image, RAM-backed staging), trained workload —
    # measured from the wire the pipeline actually ships (packed
    # connectivity planes; includes the native union-find reconstruction)
    from image_compression_tpu.io.slicer import write_slices_from_conn
    hb_np, vb_np = wire_by_trained
    t0 = time.perf_counter()
    for i in range(batch_head):
        write_slices_from_conn(images_head_u8[i], hb_np[i], vb_np[i],
                               staging, f"host_{i}")
    host_ms_per_img = (time.perf_counter() - t0) / batch_head * 1000

    # label-fetch term: pure device->host transfer of one staged batch's
    # wire (arrays already computed on device, so asarray times the relay
    # only); the uint16 label map is fetched next to it for comparison
    step_out = steps_by_workload["trained"](params_trained, images_head)
    float(jnp.sum(step_out[3]))                 # drain the queue first
    hb_dev, vb_dev = step_out[0], step_out[1]
    t0 = time.perf_counter()
    np.asarray(hb_dev), np.asarray(vb_dev)
    fetch_conn_ms_per_img = (time.perf_counter() - t0) / batch_head * 1000
    lab_dev, _, _ = segment_program(params_trained, images_head)
    float(jnp.sum(lab_dev.astype(jnp.float32)))
    t0 = time.perf_counter()
    np.asarray(lab_dev)
    fetch_u16_ms_per_img = (time.perf_counter() - t0) / batch_head * 1000

    # full pipeline, overlapped on BOTH seams: device batch i+1 is dispatched
    # while the host works on batch i, and the device->host label fetch of
    # batch i+1 (network-bound through the relay, ~0.5 s per 16.7 MB b128
    # label map, GIL-released) runs in a worker thread while the main thread
    # slices batch i (CPU-bound) — trained checkpoint, headline batch
    from concurrent.futures import ThreadPoolExecutor

    compress_step_trained = steps_by_workload["trained"]

    def full_round(pool, n_iters=5):
        t0 = time.perf_counter()
        fut = pool.submit(fetch,
                          compress_step_trained(params_trained, images_head))
        for i in range(n_iters):
            nxt = compress_step_trained(params_trained,
                                        images_head + 0.0001 * i)
            hb, vb, _ = fut.result()      # batch i ready (fetch overlapped)
            fut = pool.submit(fetch, nxt)  # fetch i+1 while slicing i
            for b in range(batch_head):
                write_slices_from_conn(images_head_u8[b], hb[b], vb[b],
                                       staging, f"it{i}_{b}")
        fut.result()
        return (time.perf_counter() - t0) / (n_iters + 1)

    with ThreadPoolExecutor(1) as pool:
        full_round(pool)                # steady-state warm-up round
        full_rate = batch_head / full_round(pool)

    # real-corpus e2e row (VERDICT r3 next #8): the same overlapped
    # pipeline on actual corpus images instead of synthetic kron noise, so
    # the e2e headline and the achieved-compression numbers come from the
    # same kind of workload. Caps are workload-derived from the corpus
    # warmup labels (the production setting). Skipped when the corpus
    # hasn't been generated (datasets/ is untracked; benchmarks/make_corpus.py).
    corpus_rate = corpus_slices = None
    corpus_dir = REPO / "datasets" / "val"
    if corpus_dir.is_dir():
        from image_compression_tpu.io.image_io import (
            find_image_files_recursively, load_image, to_float01_rgb)
        cpaths = find_image_files_recursively(corpus_dir, "png")[:batch_head]
        if len(cpaths) == batch_head:
            corpus_u8 = np.stack([np.asarray(load_image(p)) for p in cpaths])
            corpus_f = jnp.asarray(
                np.stack([to_float01_rgb(im) for im in corpus_u8]))
            clabels, chb, cvb = segment_program(params_trained, corpus_f)
            clabels_np = np.asarray(clabels).astype(np.int64)
            corpus_slices = float(np.mean(
                [len(np.unique(l)) for l in clabels_np]))
            corpus_step = make_compress_step(
                make_estimate_program(derive_class_caps(clabels_np)))

            def corpus_round(pool, n_iters=5):
                t0 = time.perf_counter()
                fut = pool.submit(fetch, corpus_step(params_trained,
                                                     corpus_f))
                for i in range(n_iters):
                    nxt = corpus_step(params_trained, corpus_f + 0.0001 * i)
                    hb, vb, _ = fut.result()
                    fut = pool.submit(fetch, nxt)
                    for b in range(batch_head):
                        write_slices_from_conn(corpus_u8[b], hb[b], vb[b],
                                               staging, f"c{i}_{b}")
                fut.result()
                return (time.perf_counter() - t0) / (n_iters + 1)

            with ThreadPoolExecutor(1) as pool:
                corpus_round(pool)      # steady-state warm-up round
                corpus_rate = batch_head / corpus_round(pool)

    shutil.rmtree(staging, ignore_errors=True)
    print(json.dumps({
        "metric": "compress_e2e_images_per_sec_256px_trained",
        "value": round(full_rate, 2),
        "unit": "images/sec",
        "vs_baseline": round(full_rate / 500.0, 4),
        "trained_checkpoint": trained_available,
        "device_pipeline_images_per_sec": round(
            results["device_b128_trained"], 2),
        "device_parity_b128_trained": round(
            results["device_parity_b128_trained"], 2),
        "device_parity_b32_trained": round(
            results["device_parity_b32_trained"], 2),
        "device_b32_trained": round(results["device_b32_trained"], 2),
        "device_b128_random": round(
            results["device_b128_random_weights"], 2),
        "device_b32_random": round(results["device_b32_random_weights"], 2),
        "slices_per_img_trained": round(slices_per_img["trained"], 1),
        "slices_per_img_random": round(
            slices_per_img["random_weights"], 1),
        "host_slice_ms_per_img": round(host_ms_per_img, 2),
        "label_fetch_conn_ms_per_img": round(fetch_conn_ms_per_img, 3),
        "label_fetch_u16_ms_per_img": round(fetch_u16_ms_per_img, 3),
        "e2e_corpus_images_per_sec": (round(corpus_rate, 2)
                                      if corpus_rate else None),
        "slices_per_img_corpus": (round(corpus_slices, 1)
                                  if corpus_slices else None),
        "estimator_class_caps_trained": list(caps_by_workload["trained"]),
        "estimator_class_caps_random": list(
            caps_by_workload["random_weights"]),
    }))


if __name__ == "__main__":
    main()
