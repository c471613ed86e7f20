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
from image_compression_tpu.train.metrics import EdgeMetrics
from image_compression_tpu.train.steps import (init_train_state,
                                               make_pretrain_eval,
                                               make_pretrain_optimizer,
                                               make_pretrain_step)


def run_pretraining(cfg: Config, use_mesh: bool = True,
                    log=print) -> tuple:
    """Returns (final TrainState, run_id)."""
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

    train_data = ImageBatches(train_paths, p.batch_size, cfg.image_size,
                              workers=4, drop_last=True, yield_indices=True)
    val_data = ImageBatches(val_paths, p.batch_size, cfg.image_size,
                            workers=2, drop_last=False)

    mesh = make_mesh() if use_mesh else None

    sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    state = init_train_state(model, tx, jax.random.PRNGKey(0), sample)
    step_fn = make_pretrain_step(model, tx, cfg)
    eval_fn = make_pretrain_eval(model, cfg)

    @jax.jit
    def targets_fn(images):
        return create_target_with_mask(images, cfg.edge_target)

    # targets are deterministic per image: compute once, reuse across epochs
    # (the reference recomputes them in dataloader workers every epoch,
    # EdgeDataset.h:101-124 — its input-bound hot loop). Cost planes are
    # {0,1}, so each image caches as packed bits (~H*W/4 bytes); masks are
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

    train_target_bits: dict = {}

    def train_targets(indices, images):
        missing = [j for j, idx in enumerate(indices)
                   if int(idx) not in train_target_bits]
        if len(missing) == len(indices):
            targets = jax.device_get(targets_fn(images))
            for j, idx in enumerate(indices):
                train_target_bits[int(idx)] = pack(targets[j, :, :, :2])
            return jnp.asarray(targets)
        if missing:  # partial batch miss: compute the whole batch, cache new
            targets = jax.device_get(targets_fn(images))
            for j in missing:
                train_target_bits[int(indices[j])] = pack(
                    targets[j, :, :, :2])
            return jnp.asarray(targets)
        costs = np.stack([unpack(train_target_bits[int(idx)])
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

    for epoch in range(1, p.epochs + 1):
        epoch_loss = 0.0
        batches = 0
        t0 = time.time()
        for batch_count, (images, indices) in enumerate(
                train_data.epoch(epoch), 1):
            images = jnp.asarray(images)
            targets = train_targets(indices, images)
            if mesh is not None:
                images, targets = shard_batch(mesh, (images, targets))
            state, aux, train_m = step_fn(state, images, targets)
            epoch_loss += float(aux["loss"])
            batches += 1

            if batch_count % p.val_every == 0 or batch_count == 1:
                val_loss, val_acc, val_sum = run_validation()
                train_acc = (int(aux["sign_correct"])
                             / max(int(aux["sign_valid"]), 1))
                tm = train_m.summary() if isinstance(train_m, EdgeMetrics) \
                    else {}
                log(f"Epoch [{epoch}/{p.epochs}] Batch [{batch_count}] "
                    f"train: loss={float(aux['loss']):.4f} "
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

        log(f"Epoch [{epoch}/{p.epochs}] avg loss "
            f"{epoch_loss / max(batches, 1):.4f} "
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
