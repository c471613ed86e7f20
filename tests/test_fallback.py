"""Per-image single-slice fallback (pipeline.py::fallback_single_slice).

The compress pipeline keeps a segmentation only when the on-device size
model predicts its slices total below margin x the whole image as one
slice — the training reward's R > 0 condition (compute_rewards.cu:182-192)
applied at compress time. All-zero labels downstream mean one full-canvas
slice; the slicer/metadata/reassembly path needs no special case.
"""

import numpy as np
import jax.numpy as jnp

from image_compression_tpu.config import Config, EdgeTarget
from image_compression_tpu.io.image_io import ensure_rgba
from image_compression_tpu.io.reassemble import reassemble_array
from image_compression_tpu.ops.rewards import (compute_rewards_batched,
                                               estimated_total_sizes_batched)
from image_compression_tpu.pipeline import (classical_costs_signed,
                                            compress_arrays,
                                            fallback_single_slice)


def block_minlabel(h, w, bs):
    """Axis-aligned block partition in minlabel form (each region labeled
    with its smallest flat pixel index), matching multicut_grid's label
    contract."""
    ys, xs = np.mgrid[:h, :w]
    return ((ys // bs * bs) * w + (xs // bs * bs)).astype(np.int32)


def test_totals_match_reward(rng):
    """estimated_total_sizes_batched is the exact sum the reward subtracts:
    reward(lam=0) == (size - total)/size (refactor guard)."""
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    labels = jnp.asarray(np.stack([block_minlabel(32, 32, 16),
                                   block_minlabel(32, 32, 8)]))
    sizes = jnp.asarray([1500.0, 2300.0])
    totals = estimated_total_sizes_batched(images, labels, k_max=32,
                                           minlabel=True)
    rewards = compute_rewards_batched(images, labels, sizes, k_max=32,
                                      lam=0.0, minlabel=True)
    np.testing.assert_allclose(np.asarray(rewards),
                               (np.asarray(sizes) - np.asarray(totals))
                               / np.asarray(sizes), rtol=1e-6)


def test_fallback_decision_and_margin(rng):
    """The decision is per image and follows the size model: slicing a
    smooth gradient pays container overhead + broken filter context for
    nothing (est 742 vs 375 here) -> fall back; slicing NOISE estimates
    slightly BELOW the whole image (the per-segment empirical entropy is
    small-sample biased low on tiny crops — reference-parity estimator
    behavior, png_size_estimator.cu:281-309) -> kept."""
    ys, xs = np.mgrid[:64, :64]
    grad = ((ys + xs) / 126.0)[..., None].repeat(3, -1).astype(np.float32)
    noise = rng.random((64, 64, 3)).astype(np.float32)
    images = jnp.asarray(np.stack([grad, noise]))
    labels = jnp.asarray(np.stack([block_minlabel(64, 64, 16)] * 2))

    out = np.asarray(fallback_single_slice(images, labels, 1.0, k_max=16))
    assert (out[0] == 0).all()                       # gradient: fell back
    np.testing.assert_array_equal(out[1], labels[1])  # noise: kept

    # a huge margin keeps every segmentation (pass-through)
    kept = np.asarray(fallback_single_slice(images, labels, 1e9, k_max=16))
    np.testing.assert_array_equal(kept, np.asarray(labels))

    # a zero margin always falls back
    np.testing.assert_array_equal(
        np.asarray(fallback_single_slice(images, labels, 0.0, k_max=16)), 0)

    # already-whole labels are a fixed point either way
    zeros = jnp.zeros_like(labels)
    np.testing.assert_array_equal(
        np.asarray(fallback_single_slice(images, zeros, 1.0, k_max=16)), 0)


def test_compress_fallback_roundtrip(tmp_path, rng):
    """Noise is the adversarial compress input (slicing always expands it):
    with the default config the output is ONE full-canvas slice and the
    round trip stays lossless; with the fallback disabled the same input
    slices into many pieces."""
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    cost_fn = lambda b: classical_costs_signed(b, EdgeTarget.CANNY)  # noqa

    cfg = Config()
    cfg.reward.max_segments = 64
    assert cfg.compress_fallback  # product default
    dirs = compress_arrays([img], cost_fn, cfg, tmp_path / "fb", ["im"])
    slices = list(dirs[0].glob("slice_*.png"))
    assert len(slices) == 1 and slices[0].name == "slice_0.png"
    np.testing.assert_array_equal(reassemble_array(dirs[0]),
                                  ensure_rgba(img))

    cfg_off = Config()
    cfg_off.compress_fallback = False
    dirs_off = compress_arrays([img], cost_fn, cfg_off, tmp_path / "raw",
                               ["im"])
    assert len(list(dirs_off[0].glob("slice_*.png"))) >= 2
    np.testing.assert_array_equal(reassemble_array(dirs_off[0]),
                                  ensure_rgba(img))


def test_compress_directory_passthrough(tmp_path, rng):
    """compress_directory with a source file: the fallback copies the
    original PNG verbatim as slice_0.png (byte-identical — output is
    guaranteed <= original + the ~49-byte metadata record) and the round
    trip stays lossless. Pack mode embeds the same original bytes."""
    from PIL import Image

    from image_compression_tpu.io.pack import read_pack
    from image_compression_tpu.pipeline import compress_directory

    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    data = tmp_path / "data"
    data.mkdir()
    Image.fromarray(img).save(data / "noise.png")
    orig_bytes = (data / "noise.png").read_bytes()

    cfg = Config()
    cfg.reward.max_segments = 64
    cfg.dataset_dir = str(data)
    cfg.results_dir = str(tmp_path / "out")
    dirs = compress_directory(cfg, classical=EdgeTarget.CANNY, batch_size=1)
    assert (dirs[0] / "slice_0.png").read_bytes() == orig_bytes
    np.testing.assert_array_equal(reassemble_array(dirs[0]),
                                  ensure_rgba(img))

    cfg.slice_container = "pack"
    cfg.results_dir = str(tmp_path / "out_pack")
    packs = compress_directory(cfg, classical=EdgeTarget.CANNY, batch_size=1)
    _records, blobs, _w, _h = read_pack(packs[0])
    assert blobs == [orig_bytes]
    np.testing.assert_array_equal(reassemble_array(packs[0]),
                                  ensure_rgba(img))
