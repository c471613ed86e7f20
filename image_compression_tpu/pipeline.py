"""End-to-end compression pipeline: images -> edge costs -> multicut ->
slices on disk -> lossless reassembly.

Device-side equivalent of the reference `compress` binary
(compress.cpp:93-153): U-Net forward (or a classical extractor), multicut
segmentation, then the host slice writer. The device portion is one jitted
batched program; only slice PNG encoding touches the host (the reference
additionally round-trips labels and bboxes mid-pipeline).
"""

from __future__ import annotations

import functools
import pathlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.config import Config, EdgeTarget
from image_compression_tpu.io.image_io import (find_image_files_recursively,
                                               load_image, to_float01_rgb)
from image_compression_tpu.io.slicer import write_slices
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.ops.edges import (edge_validity_masks,
                                             split_model_output, squash_mu)
from image_compression_tpu.ops.multicut import multicut_grid
from image_compression_tpu.ops.rewards import estimated_total_sizes_batched
from image_compression_tpu.ops.targets import compute_edge_costs


def classical_costs_signed(images: jnp.ndarray,
                           target: EdgeTarget) -> jnp.ndarray:
    """Classical {0,1} connect/cut planes -> signed multicut costs {-1,+1}
    with padding masked to 0 (the classical, non-learned compress path)."""
    costs01 = compute_edge_costs(images, target)
    height, width = costs01.shape[-3], costs01.shape[-2]
    masks = edge_validity_masks(height, width)
    return (2.0 * costs01 - 1.0) * masks


def learned_costs(model: EdgeUNet, params, images: jnp.ndarray,
                  mu_scale: float = 2.0) -> jnp.ndarray:
    """U-Net forward -> deterministic mu cost planes (compress.cpp:124-128)."""
    out = model.apply(params, images)
    mu_raw, _ = split_model_output(out)
    height, width = out.shape[-3], out.shape[-2]
    return squash_mu(mu_raw, mu_scale) * edge_validity_masks(height, width)


@functools.partial(jax.jit, static_argnames=("mode", "max_rounds",
                                             "icm_sweeps", "hier_rounds",
                                             "hier_caps", "hier_agg",
                                             "hier_leaf"))
def segment_batch(costs_bhw2: jnp.ndarray, mode: str = "random_mate",
                  max_rounds: int = 64, icm_sweeps: int = 8,
                  hier_rounds: tuple | None = None,
                  hier_caps: str | None = None,
                  hier_agg: str = "pixel",
                  hier_leaf: str = "auto") -> jnp.ndarray:
    """Batched multicut over cost planes -> labels [B, H, W] int32."""
    fn = functools.partial(multicut_grid, mode=mode, max_rounds=max_rounds,
                           icm_sweeps=icm_sweeps, hier_rounds=hier_rounds,
                           hier_caps=hier_caps, hier_agg=hier_agg,
                           hier_leaf=hier_leaf)
    return jax.vmap(fn)(costs_bhw2)


@functools.partial(jax.jit, static_argnames=("k_max", "entropy_correction",
                                             "literal_hist", "overhead_base",
                                             "distance_window"))
def fallback_single_slice(images_f01: jnp.ndarray, labels: jnp.ndarray,
                          margin: float, k_max: int = 64,
                          entropy_correction: str = "none",
                          literal_hist: str = "all",
                          overhead_base: float = 9.308622,
                          distance_window: int = 0,
                          orig_sizes: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """Per-image single-slice fallback: keep a segmentation only when the
    on-device size model predicts its slices total BELOW margin x the whole
    image as one slice; otherwise zero the labels (one full-canvas slice —
    the host slicer and metadata handle that case with no special path).

    This is the training reward's R > 0 condition applied at compress time
    (R = (size - sum est)/size, compute_rewards.cu:182-192), with the
    whole-image single-segment estimate standing in for `size` so both
    sides come from the same size model and its calibration bias cancels.
    Product divergence from the reference, which always slices
    (compress.cpp:93-153) and measurably EXPANDS natural images
    (BENCHMARKS.md achieved-compression table); with the fallback the
    output is never predicted to exceed a whole-image re-encode.

    minlabel stats apply to both sides: multicut_grid emits smallest-
    pixel-index labels, and the all-zeros labeling is its own minlabel
    form (one region whose smallest pixel index is 0).

    The full calibrated estimator profile is threaded through — including
    overhead_base, which the whole-vs-sliced inequality is most sensitive
    to (est_sliced carries K per-slice container floors vs est_whole's
    one); an earlier revision left it at the reference's fitted 9.31
    (compute_rewards.cuh:14) while the RL reward and calibration column
    priced 68, so the decision under-charged every extra slice ~59 bytes.
    """
    est_sliced = estimated_total_sizes_batched(
        images_f01, labels, k_max=k_max, minlabel=True,
        overhead_base=overhead_base, distance_window=distance_window,
        entropy_correction=entropy_correction, literal_hist=literal_hist)
    est_whole = estimated_total_sizes_batched(
        images_f01, jnp.zeros_like(labels), k_max=k_max, minlabel=True,
        overhead_base=overhead_base, distance_window=distance_window,
        entropy_correction=entropy_correction, literal_hist=literal_hist)
    # Both sides price RGBA deliberately. The fallback slice is actually
    # written as RGB (full-bbox opaque -> color type 2, io/slicer.py), but
    # the estimator's channel-MEAN entropy model prices a constant alpha
    # plane at ~0 bytes, so estimating the whole side at 3 channels RAISES
    # its mean entropy and skews decisions toward slicing — measured on
    # gradient/noise probes (tests/test_fallback.py). The real RGB-write
    # saving (~15% on incompressible content) makes margin=1.0 mildly
    # conservative toward slicing; bench_compression measures the net.
    #
    # With orig_sizes (the source files' on-disk bytes), the passthrough
    # gap is priced EXPLICITLY: a fallen-back image costs the ORIGINAL
    # bytes verbatim (write_passthrough), which can undercut the
    # whole-image re-encode model (e.g. sources encoded at a higher zlib
    # level), so the slicing must beat min(est_whole, original).
    if orig_sizes is not None:
        est_whole = jnp.minimum(est_whole, orig_sizes.astype(jnp.float32))
    keep = est_sliced < margin * est_whole
    return jnp.where(keep[:, None, None], labels, 0)


def _device_labels(images_u8: list[np.ndarray], cost_fn: Callable,
                   cfg: Config, orig_sizes=None) -> jnp.ndarray:
    """Dispatch the device half of compress for one batch; returns the
    (asynchronous) labels array — fetching it waits for this batch only."""
    batch = jnp.asarray(np.stack([to_float01_rgb(im) for im in images_u8]))
    costs = cost_fn(batch)
    mc = cfg.multicut
    labels = segment_batch(costs, mode=mc.mode,
                           max_rounds=mc.max_rounds,
                           icm_sweeps=mc.icm_sweeps,
                           hier_rounds=(tuple(mc.hier_rounds)
                                        if mc.hier_rounds else None),
                           hier_caps=mc.hier_caps, hier_agg=mc.hier_agg,
                           hier_leaf=mc.hier_leaf)
    if cfg.compress_fallback:
        labels = fallback_single_slice(
            batch, labels, cfg.fallback_margin,
            k_max=cfg.reward.max_segments,
            entropy_correction=cfg.reward.entropy_correction,
            literal_hist=cfg.reward.literal_hist,
            overhead_base=cfg.reward.overhead_base,
            distance_window=cfg.reward.distance_window,
            orig_sizes=(jnp.asarray(orig_sizes, jnp.float32)
                        if orig_sizes is not None else None))
    # ORDER MATTERS, and it is measured: fallback FIRST, merge refinement
    # only on the kept slicings (a declined image is all-zero labels = one
    # region = no adjacent pairs, so the merge pass is a no-op on it).
    # Merging before the decision lowered est_sliced enough to flip 35
    # borderline mixed-corpus losers across the orig floor — 32 of them
    # expanded for real (+233 KB) — while merging after the validated
    # keep-set saved 78 KB on the kept images with no new keeps
    # (BENCHMARKS.md round-5 merge section). Merges only ever reduce the
    # estimate, so kept slicings stay kept and the decision set is
    # unchanged.
    if cfg.merge_refine_rounds:
        from image_compression_tpu.ops.merge_refine import merge_refine_batch
        labels = merge_refine_batch(
            batch, labels, k_max=cfg.reward.max_segments,
            rounds=cfg.merge_refine_rounds,
            overhead_base=cfg.reward.overhead_base,
            entropy_correction=cfg.reward.entropy_correction,
            literal_hist=cfg.reward.literal_hist,
            distance_window=cfg.reward.distance_window)
    return labels


@jax.jit
def _pack_wire(labels: jnp.ndarray):
    """Device->host wire: 2-bit/pixel connectivity planes + a per-image
    single-slice flag (ops/labels_wire.py). At 256px this fetches 16 KB/img
    instead of the 128 KB uint16 label map — the round-3 e2e ceiling was the
    ~32 MB/s fetch relay (compress.cpp:141-142 is the boundary beaten)."""
    from image_compression_tpu.ops.labels_wire import pack_connectivity
    hbits, vbits = pack_connectivity(labels)
    single = jnp.all(labels == 0, axis=(-2, -1))
    return hbits, vbits, single


def _device_wire(images_u8: list[np.ndarray], cost_fn: Callable,
                 cfg: Config, orig_sizes=None):
    return _pack_wire(_device_labels(images_u8, cost_fn, cfg, orig_sizes))


def write_passthrough(src_path: str | pathlib.Path,
                      shape_hw: tuple[int, int],
                      results_dir: str | pathlib.Path, name: str,
                      container: str = "files") -> pathlib.Path:
    """Emit the source PNG verbatim as the single full-canvas slice.

    When the fallback chose the whole image and the source file is itself
    a PNG of those exact pixels, copying its bytes is always lossless and
    at least as small as any re-encode we'd do at the same effort — the
    output is then GUARANTEED never to exceed the original by more than
    the metadata record (~49 bytes). Also skips the host's whole-image
    encode entirely (a file copy instead)."""
    import shutil

    from image_compression_tpu.io.metadata import SliceMetadata
    height, width = shape_hw
    meta = [SliceMetadata(label=0, filename="slice_0.png", x=0, y=0,
                          width=width, height=height)]
    if container == "pack":
        from image_compression_tpu.io.pack import write_pack
        out = pathlib.Path(results_dir) / f"{name}.pack"
        out.parent.mkdir(parents=True, exist_ok=True)
        write_pack(out, meta, [pathlib.Path(src_path).read_bytes()],
                   width, height)
        return out
    out = pathlib.Path(results_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    shutil.copyfile(src_path, out / "slice_0.png")
    from image_compression_tpu.io.metadata import write_metadata_binary
    write_metadata_binary(meta, out / "metadata.bin", width, height)
    return out


def _write_batch(images_u8: list[np.ndarray], wire, cfg: Config,
                 results_dir: str | pathlib.Path,
                 names: list[str | None],
                 src_paths: list | None = None) -> list[pathlib.Path]:
    """Host half of compress for one batch: slice + write from the packed
    connectivity wire (hbits, vbits, single). With src_paths, a flagged
    single-slice image (the fallback) copies the original PNG bytes instead
    of re-encoding (write_passthrough)."""
    from image_compression_tpu.io.slicer import write_slices_from_conn
    hbits, vbits, single = wire
    out_dirs = []
    pack = cfg.slice_container == "pack"
    for i, (img, name) in enumerate(zip(images_u8, names)):
        if name is None:  # batch padding entry
            continue
        src = src_paths[i] if src_paths else None
        if src is not None and cfg.compress_fallback and single[i]:
            out_dirs.append(write_passthrough(
                src, img.shape[:2], results_dir, name,
                container=cfg.slice_container))
            continue
        write_slices_from_conn(img, hbits[i], vbits[i], results_dir, name,
                               cfg.image_format, cfg.compression_level,
                               container=cfg.slice_container)
        out_dirs.append(pathlib.Path(results_dir)
                        / (f"{name}.pack" if pack else name))
    return out_dirs


def compress_arrays(images_u8: list[np.ndarray], cost_fn: Callable,
                    cfg: Config, results_dir: str | pathlib.Path,
                    names: list[str]) -> list[pathlib.Path]:
    """Compress a list of equally-sized uint8 HWC images: batch on device,
    slice + write on host. Returns the per-image output directories."""
    wire = jax.tree.map(np.asarray, _device_wire(images_u8, cost_fn, cfg))
    return _write_batch(images_u8, wire, cfg, results_dir, names)


def image_dims(path: pathlib.Path) -> tuple[int, int]:
    """(H, W) from the PNG IHDR without decoding pixel data."""
    with open(path, "rb") as f:
        head = f.read(26)
    if head[:8] == b"\x89PNG\r\n\x1a\n" and head[12:16] == b"IHDR":
        width = int.from_bytes(head[16:20], "big")
        height = int.from_bytes(head[20:24], "big")
        return height, width
    from PIL import Image
    with Image.open(path) as im:  # lazy: reads the header only
        return im.size[1], im.size[0]


def compress_directory(cfg: Config, params=None, limit: int | None = None,
                       classical: EdgeTarget | None = None,
                       batch_size: int = 8) -> list[pathlib.Path]:
    """The `compress` entry point (compress.cpp:93-153): scan the dataset dir,
    segment every image, write slices + metadata into results_dir/<stem>/.

    With `params` uses the learned U-Net; otherwise `classical` (default
    Canny) costs — the CPU-runnable configuration.

    Images are bucketed by shape and fed to the device in `batch_size`
    batches (trailing batches padded by repetition so each distinct image
    shape compiles exactly ONE program, regardless of how many images it
    has): the device path stays batched like the benched pipeline instead of
    degrading to one compile + one B=1 dispatch per image. Dims come from
    PNG headers, so only the current batch's pixels are ever in memory.
    """
    paths = find_image_files_recursively(cfg.dataset_dir, cfg.image_format)
    if limit:
        paths = paths[:limit]
    print(f"Found {len(paths)} images")
    model = EdgeUNet()
    if params is not None:
        cost_fn = lambda b: learned_costs(model, params, b)  # noqa: E731
    else:
        target = classical or EdgeTarget.CANNY
        cost_fn = lambda b: classical_costs_signed(b, target)  # noqa: E731

    by_shape: dict[tuple[int, int], list[pathlib.Path]] = {}
    for path in paths:
        by_shape.setdefault(image_dims(path), []).append(path)

    # Device and host run overlapped on both seams, exactly like the benched
    # pipeline (bench.py): batch i+1's device programs are dispatched BEFORE
    # batch i is consumed on the host, and batch i+1's device->host label
    # fetch (network-bound through the relay, GIL-released) runs in a worker
    # thread while the main thread slices batch i (CPU-bound). e2e
    # throughput is max(device, fetch, host) instead of their sum.
    from concurrent.futures import ThreadPoolExecutor

    out = []
    pending = None  # (images, names, src paths, future of the fetched wire)
    with ThreadPoolExecutor(1) as pool:
        for shape, group in sorted(by_shape.items()):
            for i in range(0, len(group), batch_size):
                chunk = group[i:i + batch_size]
                imgs = [load_image(p) for p in chunk]
                pad = (batch_size - len(chunk)
                       if len(group) > batch_size else 0)
                sizes = [p.stat().st_size for p in chunk]
                sizes += sizes[-1:] * pad
                wire = _device_wire(imgs + imgs[-1:] * pad, cost_fn, cfg,
                                    orig_sizes=sizes)
                fut = pool.submit(
                    lambda w=wire: jax.tree.map(np.asarray, w))
                names = [p.stem for p in chunk] + [None] * pad
                srcs = list(chunk) + [None] * pad
                if pending is not None:
                    out += _write_batch(pending[0], pending[3].result(),
                                        cfg, cfg.results_dir, pending[1],
                                        src_paths=pending[2])
                pending = (imgs + imgs[-1:] * pad, names, srcs, fut)
        if pending is not None:
            out += _write_batch(pending[0], pending[3].result(),
                                cfg, cfg.results_dir, pending[1],
                                src_paths=pending[2])
    return out
