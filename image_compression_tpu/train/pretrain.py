"""Supervised pretraining driver (pretraining.cpp:212-397).

Epoch loop over the train set with periodic validation (every val_every
batches), best-on-val / per-epoch / final checkpoints under a unix-timestamp
run id, and the reference's metric surface: loss, sign accuracy, P/R/F1 for
connect and cut. Classical targets are computed on device, batched, inside
the step wrapper; data parallelism comes from feeding mesh-sharded batches.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.config import Config
from image_compression_tpu.io.image_io import find_image_files_recursively
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.ops.targets import create_target_with_mask
from image_compression_tpu.parallel.mesh import (make_mesh, replicate,
                                                 shard_batch)
from image_compression_tpu.train.checkpoint import CheckpointManager
from image_compression_tpu.train.data import ImageBatches
from image_compression_tpu.train.metrics import EdgeMetrics, MetricsLogger
from image_compression_tpu.train.steps import (init_train_state,
                                               make_pretrain_eval,
                                               make_pretrain_optimizer,
                                               make_pretrain_step)


class TargetDiskCache:
    """Disk layer of the pretraining target cache: one packed-bits file per
    (image path, extractor, resolution) under cache_dir/targets, so target
    generation survives driver restarts (the RAM dict alone loses ~hours of
    extractor work on a 100k-image corpus). Files are written atomically
    (tmp + rename) so a killed run never leaves truncated entries."""

    # bump when an extractor's output changes (v2: hierarchical felzenszwalb)
    VERSION = 2

    def __init__(self, cache_dir, extractor: str, image_size: int):
        import hashlib
        import pathlib
        self.dir = pathlib.Path(cache_dir) / "targets"
        self.dir.mkdir(parents=True, exist_ok=True)
        self._tag = f"{extractor}|{image_size}|v{self.VERSION}"
        self._hashlib = hashlib

    def _path(self, image_path):
        key = self._hashlib.sha1(
            f"{image_path}|{self._tag}".encode()).hexdigest()
        return self.dir / f"{key}.bits"

    def load(self, image_path) -> np.ndarray | None:
        p = self._path(image_path)
        try:
            return np.fromfile(p, dtype=np.uint8)
        except FileNotFoundError:
            return None

    def store(self, image_path, bits: np.ndarray) -> None:
        import os
        p = self._path(image_path)
        # per-writer tmp name: concurrent multi-host writers must not
        # interleave into one tmp file before the atomic rename
        tmp = p.with_suffix(f".{os.getpid()}.tmp")
        bits.tofile(tmp)
        tmp.replace(p)


def run_pretraining(cfg: Config, use_mesh: bool = True,
                    log=print, resume: str | None = None,
                    init_params: str | None = None) -> tuple:
    """Returns (final TrainState, run_id).

    init_params: path to a params-only checkpoint (save_params layout) to
    WARM-START from — params are loaded, optimizer state and step start
    fresh. This is domain fine-tuning (e.g. a naturals-pretrained policy
    onto the mixed deployment corpus), distinct from `resume`, which
    restores the full TrainState mid-run.

    resume: path to a prior run's checkpoint (params + optimizer state +
    step, train/checkpoint.py) — training continues at the epoch implied by
    the restored step counter. Together with the SIGTERM/SIGINT interrupt
    checkpoint below this makes training preemption-safe: the failure-
    recovery subsystem the reference lacks entirely (SURVEY.md section 5;
    torch::save there keeps no optimizer state, pretraining.cpp:376-395).
    """
    p = cfg.pretrain
    model = EdgeUNet()
    tx = make_pretrain_optimizer(cfg)

    train_paths = find_image_files_recursively(cfg.dataset_dir,
                                               cfg.image_format)
    train_paths = train_paths[:p.max_train_images]
    val_paths = find_image_files_recursively(cfg.val_dataset_dir,
                                             cfg.image_format)
    val_paths = val_paths[:p.max_val_images]
    if not train_paths:
        raise FileNotFoundError(f"no images under {cfg.dataset_dir}")

    cache = 4 << 30  # decoded-image RAM cache (epochs re-read the corpus)
    train_data = ImageBatches(train_paths, p.batch_size, cfg.image_size,
                              workers=4, drop_last=True, yield_indices=True,
                              cache_bytes=cache)
    val_data = ImageBatches(val_paths, p.batch_size, cfg.image_size,
                            workers=2, drop_last=False,
                            cache_bytes=cache // 4)

    mesh = make_mesh() if use_mesh else None

    sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), sample)
    start_epoch = 1
    if init_params is not None:
        if resume is not None:
            # resume restores the FULL state below, which would silently
            # discard the warm start — make the conflict loud instead
            raise ValueError("--init-params and --resume are mutually "
                             "exclusive: resume restores full state and "
                             "would discard the warm-started params")
        from image_compression_tpu.train.checkpoint import load_params
        params = load_params(init_params, template=state.params)
        state = state._replace(params=params)
        log(f"warm-started params from {init_params}")
    if resume is not None:
        state = CheckpointManager.restore_path(resume, state)
        steps_per_epoch = max(len(train_paths) // p.batch_size, 1)
        start_epoch = 1 + int(state.step) // steps_per_epoch
        log(f"resumed from {resume} at step {int(state.step)} "
            f"(epoch {start_epoch})")
    step_fn = make_pretrain_step(model, tx, cfg)
    eval_fn = make_pretrain_eval(model, cfg)

    import functools

    from image_compression_tpu.config import EdgeTarget

    # cycled extractor schedule (cfg.pretrain.target_ensemble): batch t
    # trains against extractor t mod 4; validation stays on cfg.edge_target
    ensemble = ([EdgeTarget.GRAPH, EdgeTarget.CANNY, EdgeTarget.SLIC,
                 EdgeTarget.WATERSHED] if p.target_ensemble
                else [cfg.edge_target])

    @functools.partial(jax.jit, static_argnames=("target",))
    def targets_fn(images, target=cfg.edge_target):
        return create_target_with_mask(images, target)

    # targets are deterministic per image: compute once, reuse across epochs
    # (the reference recomputes them in dataloader workers every epoch,
    # EdgeDataset.h:101-124 — its input-bound hot loop). Cost planes are
    # {0,1}, so each image caches as packed bits (~H*W/4 bytes) in RAM AND
    # on disk under cfg.cache_dir keyed by image path + extractor config, so
    # a 100k-image run survives restarts without re-segmenting; masks are
    # static and rebuilt on load.
    from image_compression_tpu.ops.edges import edge_validity_masks

    masks_np = np.asarray(edge_validity_masks(cfg.image_size, cfg.image_size))
    target_cache: dict = {}

    def targets_cached(key, images):
        if key not in target_cache:
            target_cache[key] = jax.device_get(targets_fn(images))
        return jnp.asarray(target_cache[key])

    def pack(costs_hw2):
        return np.packbits(costs_hw2.astype(np.uint8), axis=None)

    def unpack(bits):
        flat = np.unpackbits(bits, count=cfg.image_size * cfg.image_size * 2)
        return flat.reshape(cfg.image_size, cfg.image_size, 2) \
            .astype(np.float32)

    disks = {t: TargetDiskCache(cfg.cache_dir, t.value, cfg.image_size)
             for t in ensemble}
    train_target_bits: dict = {}

    def lookup(target, idx) -> np.ndarray | None:
        bits = train_target_bits.get((target, int(idx)))
        if bits is None:
            bits = disks[target].load(train_paths[int(idx)])
            if bits is not None:
                train_target_bits[(target, int(idx))] = bits
        return bits

    def train_targets(indices, images, target):
        missing = [j for j, idx in enumerate(indices)
                   if lookup(target, idx) is None]
        if missing:  # any miss: compute the whole batch, cache new entries
            targets = jax.device_get(targets_fn(images, target))
            for j in missing:
                bits = pack(targets[j, :, :, :2])
                train_target_bits[(target, int(indices[j]))] = bits
                disks[target].store(train_paths[int(indices[j])], bits)
            return jnp.asarray(targets)
        costs = np.stack([unpack(train_target_bits[(target, int(idx))])
                          for idx in indices])
        costs = costs * masks_np[None]
        return jnp.asarray(np.concatenate(
            [costs, np.broadcast_to(masks_np[None], costs.shape)], axis=-1))

    if mesh is not None:
        state = replicate(mesh, state)

    ckpt = CheckpointManager(cfg.results_dir, "fcn_pretrained")
    best_val_loss = float("inf")

    def run_validation():
        loss_num = loss_den = 0.0
        correct = valid = 0
        agg = None
        for i, images in enumerate(val_data.epoch(0, shuffle=False)):
            images = jnp.asarray(images)
            targets = targets_cached(("val", i), images)
            if mesh is not None and images.shape[0] % mesh.size == 0:
                images, targets = shard_batch(mesh, (images, targets))
            stats, m = eval_fn(state.params, images, targets)
            w = float(stats["valid_weight"])
            loss_num += float(stats["loss"]) * w
            loss_den += w
            correct += int(stats["sign_correct"])
            valid += int(stats["sign_valid"])
            agg = m if agg is None else agg + m
        val_loss = loss_num / max(loss_den, 1e-12)
        acc = correct / max(valid, 1)
        return val_loss, acc, (agg.summary() if agg is not None else {})

    metrics_log = MetricsLogger(cfg.results_dir, ckpt.run_id)

    # preemption safety: first SIGTERM/SIGINT finishes the current batch,
    # checkpoints as "<run>_interrupt", and returns cleanly (resume with
    # resume=<that path>); a second signal falls through to the default
    # handler. TPU pods preempt with SIGTERM, so this is the elastic-
    # recovery seam.
    import signal

    interrupted = {"flag": False}
    prev_handlers = {}

    def _on_signal(signum, frame):
        interrupted["flag"] = True
        signal.signal(signum, prev_handlers[signum])

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (tests): run without handlers
            prev_handlers.pop(sig, None)

    for epoch in range(start_epoch, p.epochs + 1):
        epoch_losses: list = []   # device scalars; fetched once per epoch
        t0 = time.time()
        for batch_count, (images, indices) in enumerate(
                train_data.epoch(epoch), 1):
            images = jnp.asarray(images)
            ext = ensemble[(epoch * 7919 + batch_count) % len(ensemble)]
            targets = train_targets(indices, images, ext)
            if mesh is not None:
                images, targets = shard_batch(mesh, (images, targets))
            state, aux, train_m = step_fn(state, images, targets)
            # NO per-step host fetch: a float() here costs a ~30 ms device
            # round-trip per batch on the relay (CLAUDE.md), several times
            # the step itself
            epoch_losses.append(aux["loss"])
            if interrupted["flag"]:
                path = ckpt.save("interrupt", state)
                log(f"interrupted: checkpointed to {path}")
                return state, ckpt.run_id

            if batch_count % p.val_every == 0 or batch_count == 1:
                val_loss, val_acc, val_sum = run_validation()
                train_acc = (int(aux["sign_correct"])
                             / max(int(aux["sign_valid"]), 1))
                tm = train_m.summary() if isinstance(train_m, EdgeMetrics) \
                    else {}
                record = {
                    "phase": "pretrain", "epoch": epoch,
                    "batch": batch_count,
                    "train_loss": float(aux["loss"]),
                    "train_sign_acc": train_acc,
                    "val_loss": val_loss, "val_sign_acc": val_acc,
                    **{f"train_{k}": v for k, v in tm.items()},
                    **{f"val_{k}": v for k, v in val_sum.items()},
                }
                metrics_log.write(record)
                log(f"Epoch [{epoch}/{p.epochs}] Batch [{batch_count}] "
                    f"train: loss={record['train_loss']:.4f} "
                    f"sign_acc={train_acc:.4f} "
                    f"cut P/R/F1={tm.get('precision_cut', 0):.3f}/"
                    f"{tm.get('recall_cut', 0):.3f}/{tm.get('f1_cut', 0):.3f} "
                    f"| val: loss={val_loss:.4f} sign_acc={val_acc:.4f} "
                    f"cut P/R/F1={val_sum.get('precision_cut', 0):.3f}/"
                    f"{val_sum.get('recall_cut', 0):.3f}/"
                    f"{val_sum.get('f1_cut', 0):.3f}")
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    ckpt.save("best", state)

        avg_loss = float(jnp.mean(jnp.stack(epoch_losses))) \
            if epoch_losses else 0.0
        metrics_log.write({"phase": "pretrain_epoch", "epoch": epoch,
                           "avg_loss": avg_loss,
                           "seconds": time.time() - t0})
        log(f"Epoch [{epoch}/{p.epochs}] avg loss {avg_loss:.4f} "
            f"({time.time() - t0:.1f}s)")
        ckpt.save(f"epoch_{epoch}", state)

    ckpt.save("final", state)
    return state, ckpt.run_id


def np_images_placeholder(batch: int, size: int) -> np.ndarray:
    return np.zeros((batch, size, size, 3), np.float32)


def compute_global_pos_weight(data: ImageBatches, cfg: Config,
                              max_batches: int | None = None) -> float:
    """Dataset-wide neg/pos ratio of the connect class
    (compute_global_pos_weight, pretraining.cpp:189-207 — defined there but
    unused; the reference hardcodes 0.1 instead, pretraining.cpp:264-267).
    Offered for configs that want a data-derived pos_weight."""
    import jax.numpy as jnp

    from image_compression_tpu.ops.targets import create_target_with_mask

    @jax.jit
    def counts(images):
        t = create_target_with_mask(images, cfg.edge_target)
        y = jnp.stack([t[..., 0], t[..., 1]], -1)
        m = jnp.stack([t[..., 2], t[..., 3]], -1) > 0
        pos = jnp.sum((y > 0.5) & m)
        neg = jnp.sum((y < 0.5) & m)
        return pos, neg

    n_pos = n_neg = 0.0
    for i, images in enumerate(data.epoch(0, shuffle=False)):
        if isinstance(images, tuple):
            images = images[0]
        p_, n_ = counts(jnp.asarray(images))
        n_pos += float(p_)
        n_neg += float(n_)
        if max_batches and i + 1 >= max_batches:
            break
    return (n_neg + 1e-6) / (n_pos + 1e-6)
