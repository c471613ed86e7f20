"""Online REINFORCE driver (training.cpp:68-240).

Loads pretrained params, then per batch: one fully-jitted RL step (policy
sample -> multicut -> PNG-size reward -> EMA baseline -> whitened advantage
-> entropy-regularized REINFORCE update with grad clip). Deterministic-mu
evaluation + checkpoint every eval_every steps, final checkpoint at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from image_compression_tpu.config import Config
from image_compression_tpu.io.image_io import find_image_files_recursively
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.parallel.mesh import (make_mesh, replicate,
                                                 shard_batch)
from image_compression_tpu.train.checkpoint import (CheckpointManager,
                                                    save_params)
from image_compression_tpu.train.data import ImageBatches
from image_compression_tpu.train.metrics import MetricsLogger
from image_compression_tpu.train.steps import (init_rl_state,
                                               make_rl_eval,
                                               make_rl_optimizer,
                                               make_rl_step,
                                               make_value_optimizer)


def run_reinforce(cfg: Config, pretrained_params, use_mesh: bool = True,
                  log=print, resume: str | None = None):
    """Returns (final RLState, run_id).

    resume: path to a prior RL checkpoint (full RLState incl. optimizer,
    EMA baseline and value-net state) — continues at the restored step.
    The value-baseline flag must match the run being resumed (the state
    trees differ). SIGTERM/SIGINT checkpoint an "<run>_interrupt" state
    and return cleanly, mirroring train/pretrain.py's preemption seam.
    """
    r = cfg.rl
    model = EdgeUNet()
    tx = make_rl_optimizer(cfg)
    value_model = value_tx = None
    value_params = ()
    if r.baseline == "value":
        from image_compression_tpu.models.value import ValueNet
        value_model = ValueNet()
        value_tx = make_value_optimizer(cfg)
        value_params = value_model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32))
    state = init_rl_state(pretrained_params, tx, value_params, value_tx)
    if resume is not None:
        state = CheckpointManager.restore_path(resume, state)
        log(f"resumed RL state from {resume} at step {int(state.step)}")

    train_paths = find_image_files_recursively(cfg.dataset_dir,
                                               cfg.image_format)
    train_paths = train_paths[:r.max_train_images]
    val_paths = find_image_files_recursively(cfg.val_dataset_dir,
                                             cfg.image_format)
    val_paths = val_paths[:r.max_val_images]
    if not train_paths:
        raise FileNotFoundError(f"no images under {cfg.dataset_dir}")

    cache = 4 << 30  # decoded-image RAM cache (epochs re-read the corpus)
    train_data = ImageBatches(train_paths, r.batch_size, cfg.image_size,
                              with_file_sizes=True, workers=4, drop_last=True,
                              cache_bytes=cache)
    val_data = ImageBatches(val_paths, r.batch_size, cfg.image_size,
                            with_file_sizes=True, workers=2, drop_last=False,
                            cache_bytes=cache // 4)

    mesh = make_mesh() if use_mesh else None
    if mesh is not None:
        state = replicate(mesh, state)

    step_fn = make_rl_step(model, tx, cfg, value_model, value_tx)
    eval_fn = make_rl_eval(model, cfg)
    ckpt = CheckpointManager(cfg.results_dir, "fcn_training")
    metrics_log = MetricsLogger(cfg.results_dir, ckpt.run_id)
    # constant base key: the step folds in its device step counter itself
    # (a host-side split per step costs a ~30 ms relay dispatch)
    key = jax.random.PRNGKey(0)

    def run_eval():
        rsum = 0.0
        n = 0
        for images, sizes in val_data.epoch(0, shuffle=False):
            images = jnp.asarray(images)
            sizes = jnp.asarray(sizes)
            if mesh is not None and images.shape[0] % mesh.size == 0:
                images, sizes = shard_batch(mesh, (images, sizes))
            rewards = eval_fn(state.params, images, sizes)
            rsum += float(rewards.sum())
            n += images.shape[0]
        return rsum / max(n, 1)

    import signal

    interrupted = {"flag": False}
    prev_handlers = {}

    def _on_signal(signum, frame):
        interrupted["flag"] = True
        signal.signal(signum, prev_handlers[signum])

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:  # non-main thread (tests)
            prev_handlers.pop(sig, None)

    # skip epochs a resumed run already finished (step counts batches)
    steps_per_epoch = max(len(train_paths) // r.batch_size, 1)
    start_epoch = int(state.step) // steps_per_epoch
    n_evals = 0
    best_eval = -float("inf")

    for epoch in range(start_epoch, r.epochs):
        for batch_count, (images, sizes) in enumerate(
                train_data.epoch(epoch), 1):
            images = jnp.asarray(images)
            sizes = jnp.asarray(sizes)
            if mesh is not None:
                images, sizes = shard_batch(mesh, (images, sizes))
            state, aux = step_fn(state, key, images, sizes)
            if interrupted["flag"]:
                path = ckpt.save("interrupt", state)
                log(f"interrupted: checkpointed to {path}")
                return state, ckpt.run_id

            # stride capped at the epoch length: batch_count resets per
            # epoch, so a large batch_size (few steps/epoch) would
            # otherwise never reach eval_every and the run would finish
            # with NO evals and NO best checkpoint (hit by the round-5
            # batch-32 run: 32 steps/epoch vs eval_every=100)
            if batch_count % min(r.eval_every, steps_per_epoch) == 0:
                n_evals += 1
                eval_r = run_eval()
                record = {"phase": "rl", "epoch": epoch, "step": batch_count,
                          "loss": float(aux["loss"]),
                          "reward_mean": float(aux["reward_mean"]),
                          "baseline": float(aux["baseline"]),
                          "eval_reward_mean": eval_r,
                          "sampler": r.sampler, "rl_baseline": r.baseline}
                if r.baseline == "value":
                    record["value_loss"] = float(aux["value_loss"])
                metrics_log.write(record)
                log(f"epoch={epoch} step={batch_count} "
                    f"loss={record['loss']:.6f} "
                    f"Rmean={record['reward_mean']:.4f} "
                    f"baseline={record['baseline']:.4f}")
                log(f"Eval reward mean={eval_r:.4f}")
                # a full-state orbax save costs several seconds on slow
                # filesystems — several times the 100 train steps between
                # evals; keep the metric cadence but checkpoint sparsely
                if n_evals % 5 == 0:
                    ckpt.save("latest", state)
                # best-on-eval params (pretrain.py keeps a "best" too;
                # the reference only checkpoints on a fixed cadence,
                # training.cpp:230). RL on the low-variance fallback-aware
                # reward can drift AWAY from a good start (measured: the
                # fbmin, fbdiff_unclipped, fbclip_whiten and fbnw_lr1e4
                # runs all decline from epoch 0 —
                # artifacts/metrics_r4_rl_{...}.jsonl), so the retained
                # artifact must be the best policy seen, not the last one.
                # Params-only save: on a near-monotone curve "best" fires
                # on ~half the evals, and a full-state save each time would
                # defeat the sparse-checkpoint rationale above; the best
                # artifact is for deployment/eval, which needs no opt state.
                if eval_r > best_eval:
                    best_eval = eval_r
                    save_params(ckpt._path("best_params"), state.params)

    ckpt.save("final", state)
    return state, ckpt.run_id
