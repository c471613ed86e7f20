"""Host slice-writing cost vs worker count: the e2e scaling evidence.

The device pipeline outruns the host slicer on this 1-core sandbox, so the
e2e headline is host-bound (VERDICT round-2 weak #1 / next #9). This bench
isolates the host cost of write_slices (native C++ encoder, RAM-backed
staging — the per-image work of image_slicer.cpp:81-130) at 1/2/4 thread
workers, reports wall AND process-CPU seconds per image, and extrapolates
the host-core requirement for the 500 img/s/chip BASELINE target: on one
core wall==cpu, so cores_needed = cpu_s_per_img * 500 (slice encoding is
embarrassingly parallel across images; the reference fans out with
std::async the same way).

Workloads: random rectangle partitions at the trained checkpoint's measured
slice count (~38 slices/img) and at the random-weights stress count (~245).

Usage: PYTHONPATH=. python benchmarks/bench_host_scaling.py [--images 32]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def make_labels(n_regions: int, size: int, seed: int) -> np.ndarray:
    """Random rectangle partition with ~n_regions regions (the reference's
    orphaned random_partition.hpp fixture, utils/random_partition.py)."""
    from image_compression_tpu.utils.random_partition import \
        random_rect_partition
    min_side = max(4, int(size / np.sqrt(n_regions) * 0.7))
    return random_rect_partition(size, size, min_h=min_side,
                                 min_w=min_side, split_prob=0.97,
                                 min_rect_count=n_regions, seed=seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    from image_compression_tpu.io.slicer import write_slices

    staging = pathlib.Path("/dev/shm" if os.path.isdir("/dev/shm")
                           else "/tmp") / "bench_host_scaling"

    rng = np.random.default_rng(0)
    images = [(rng.random((args.size, args.size, 3)) * 255).astype(np.uint8)
              for _ in range(args.images)]

    report = {"cpu_count": os.cpu_count()}
    for wl_name, n_regions in (("trained_38", 38), ("stress_245", 245)):
        labels = [make_labels(n_regions, args.size, seed=i)
                  for i in range(args.images)]
        k_mean = float(np.mean([len(np.unique(l)) for l in labels]))
        wl = {"slices_per_img": round(k_mean, 1)}
        for workers in (1, 2, 4):
            shutil.rmtree(staging, ignore_errors=True)
            staging.mkdir(parents=True)
            # warm-up pass (page cache, thread pools, lazy imports)
            write_slices(images[0], labels[0], staging, "warm",
                         max_workers=workers)
            t0w, t0c = time.perf_counter(), time.process_time()
            for i, (img, lab) in enumerate(zip(images, labels)):
                write_slices(img, lab, staging, f"w{workers}_{i}",
                             max_workers=workers)
            wall = (time.perf_counter() - t0w) / args.images
            cpu = (time.process_time() - t0c) / args.images
            wl[f"workers_{workers}"] = {
                "wall_ms_per_img": round(wall * 1000, 2),
                "cpu_ms_per_img": round(cpu * 1000, 2),
            }
        cpu1 = wl["workers_1"]["cpu_ms_per_img"] / 1000
        wl["cores_for_500_img_s"] = round(cpu1 * 500, 1)
        # pack container (io/pack.py): same bytes, ONE file create per
        # image instead of K+1 — the file-system share of the host cost
        shutil.rmtree(staging, ignore_errors=True)
        staging.mkdir(parents=True)
        write_slices(images[0], labels[0], staging, "warm", container="pack")
        t0w, t0c = time.perf_counter(), time.process_time()
        for i, (img, lab) in enumerate(zip(images, labels)):
            write_slices(img, lab, staging, f"p{i}", container="pack",
                         max_workers=1)
        wl["pack_workers_1"] = {
            "wall_ms_per_img": round(
                (time.perf_counter() - t0w) / args.images * 1000, 2),
            "cpu_ms_per_img": round(
                (time.process_time() - t0c) / args.images * 1000, 2),
        }
        cpu1p = wl["pack_workers_1"]["cpu_ms_per_img"] / 1000
        wl["pack_cores_for_500_img_s"] = round(cpu1p * 500, 1)
        # conn-wire path (round 5, VERDICT r4 weak #1): the production host
        # half is write_slices_from_conn = union-find label reconstruction
        # + the same slicer. Isolate the reconstruction so a regression in
        # either term is attributable: labels_from_conn alone, then the
        # combined call (its slicer share = combined - reconstruction).
        from image_compression_tpu.io import native
        from image_compression_tpu.io.slicer import write_slices_from_conn
        if native.available():
            import jax
            from image_compression_tpu.ops.labels_wire import \
                pack_connectivity
            wires = []
            with jax.default_device(jax.devices("cpu")[0]):
                for lab in labels:
                    hb, vb = pack_connectivity(
                        np.asarray(lab, np.int32)[None])
                    wires.append((np.asarray(hb[0]), np.asarray(vb[0])))
            t0c = time.process_time()
            for hb, vb in wires:
                native.labels_from_conn_native(hb, vb, args.size, args.size)
            wl["conn_reconstruct_cpu_ms_per_img"] = round(
                (time.process_time() - t0c) / args.images * 1000, 2)
            shutil.rmtree(staging, ignore_errors=True)
            staging.mkdir(parents=True)
            write_slices_from_conn(images[0], *wires[0], staging, "warm")
            t0w, t0c = time.perf_counter(), time.process_time()
            for i, (img, (hb, vb)) in enumerate(zip(images, wires)):
                write_slices_from_conn(img, hb, vb, staging, f"c{i}")
            wl["conn_combined"] = {
                "wall_ms_per_img": round(
                    (time.perf_counter() - t0w) / args.images * 1000, 2),
                "cpu_ms_per_img": round(
                    (time.process_time() - t0c) / args.images * 1000, 2),
            }
            cpu1c = wl["conn_combined"]["cpu_ms_per_img"] / 1000
            wl["conn_cores_for_500_img_s"] = round(cpu1c * 500, 1)
        report[wl_name] = wl
        shutil.rmtree(staging, ignore_errors=True)
    print(json.dumps({"metric": "host_slice_scaling", **report}))


if __name__ == "__main__":
    main()
