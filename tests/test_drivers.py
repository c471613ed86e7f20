"""End-to-end driver smoke tests: run_pretraining and run_reinforce on a
tiny synthetic dataset (the full epoch loop, validation, checkpointing)."""

import numpy as np
import pytest

from image_compression_tpu.config import Config, EdgeTarget
from image_compression_tpu.io.image_io import write_image
from image_compression_tpu.utils.pattern_generator import GENERATORS


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    train = tmp_path / "train"
    val = tmp_path / "val"
    train.mkdir()
    val.mkdir()
    for i in range(8):
        img = GENERATORS["low_frequency"](32, 32, False, rng)
        write_image(train / f"t{i}.png", img)
    for i in range(2):
        img = GENERATORS["low_frequency"](32, 32, False, rng)
        write_image(val / f"v{i}.png", img)
    return train, val


def tiny_cfg(tmp_path, train, val):
    cfg = Config()
    cfg.dataset_dir = str(train)
    cfg.val_dataset_dir = str(val)
    cfg.results_dir = str(tmp_path / "results")
    cfg.cache_dir = str(tmp_path / "cache")
    cfg.image_size = 32
    cfg.edge_target = EdgeTarget.CANNY  # cheapest extractor
    cfg.pretrain.epochs = 1
    cfg.pretrain.batch_size = 4
    cfg.pretrain.val_every = 2
    cfg.rl.epochs = 1
    cfg.rl.batch_size = 4
    cfg.rl.eval_every = 2
    cfg.multicut.max_rounds = 6
    cfg.multicut.icm_sweeps = 1
    cfg.reward.max_segments = 16
    return cfg


def test_pretrain_then_reinforce(tmp_path, tiny_dataset):
    import jax.numpy as jnp

    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.train.pretrain import run_pretraining
    from image_compression_tpu.train.reinforce import run_reinforce

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)

    logs = []
    state, run_id = run_pretraining(cfg, use_mesh=False, log=logs.append)
    assert int(state.step) == 2  # 8 imgs / batch 4
    assert any("val" in ln for ln in logs)
    results = list((tmp_path / "results").iterdir())
    assert any("best" in p.name for p in results)
    assert any("final" in p.name for p in results)

    # hand the pretrained params to the RL phase (training.cpp:75)
    rl_logs = []
    # small model config must match; replace the model dtype default used in
    # drivers (bf16) is fine on CPU too
    rl_state, _rl_id = run_reinforce(cfg, state.params, use_mesh=False,
                                     log=rl_logs.append)
    assert int(rl_state.step) == 2
    assert bool(rl_state.baseline_init)
    assert any("Eval reward" in ln for ln in rl_logs)

    # structured metrics sink: one JSONL file per run with train/val records
    import json
    jsonls = list((tmp_path / "results").glob("metrics_*.jsonl"))
    assert jsonls, "no metrics JSONL written"
    records = [json.loads(ln) for p in jsonls
               for ln in p.read_text().splitlines()]
    assert any(r.get("phase") == "pretrain" and "val_loss" in r
               for r in records)
    assert any(r.get("phase") == "rl" and "eval_reward_mean" in r
               for r in records)


def test_pretrain_target_ensemble(tmp_path, tiny_dataset):
    """cfg.pretrain.target_ensemble cycles the four classical extractors per
    batch (config.py rationale: BCE is linear in the target, so cycling
    binary targets optimizes the soft 4-way-mean objective) and keys the
    target caches per extractor."""
    from image_compression_tpu.train.pretrain import run_pretraining

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)
    cfg.pretrain.target_ensemble = True
    state, _ = run_pretraining(cfg, use_mesh=False, log=lambda *_: None)
    assert int(state.step) == 2
    cache_files = list((tmp_path / "cache" / "targets").glob("*.bits"))
    assert len(cache_files) == 8  # 2 batches x 4 imgs, distinct extractors


def test_target_cache_survives_restart(tmp_path, tiny_dataset):
    """Disk-backed target cache: a second driver invocation must hit disk
    instead of recomputing targets (VERDICT round-1 item 9)."""
    from unittest import mock

    from image_compression_tpu.train import pretrain as pt

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)

    pt.run_pretraining(cfg, use_mesh=False, log=lambda *_: None)
    cache_files = list((tmp_path / "cache" / "targets").glob("*.bits"))
    assert len(cache_files) == 8  # one per training image

    # second invocation: if any train target is recomputed (disk miss), the
    # poisoned extractor raises
    from image_compression_tpu.ops import targets as targets_mod
    real = targets_mod.create_target_with_mask
    calls = {"train_misses": 0}

    def poisoned(images, target):
        # validation targets are cached in RAM per-process only, so they
        # recompute; train batches are batch_size=4, val is 2 images
        if images.shape[0] == cfg.pretrain.batch_size:
            calls["train_misses"] += 1
        return real(images, target)

    with mock.patch.object(pt, "create_target_with_mask", poisoned):
        pt.run_pretraining(cfg, use_mesh=False, log=lambda *_: None)
    assert calls["train_misses"] == 0, "train targets recomputed on restart"


@pytest.mark.parametrize("variant", ["antithetic", "value"])
def test_reinforce_variants(tmp_path, tiny_dataset, variant):
    """Variance-reduction flags (documented divergence from training.cpp):
    mirrored-pair sampler and learned value baseline both run the full
    driver loop and produce finite losses/rewards."""
    import jax

    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.train.reinforce import run_reinforce

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)
    if variant == "antithetic":
        cfg.rl.sampler = "antithetic"
    else:
        cfg.rl.baseline = "value"

    import jax.numpy as jnp
    model = EdgeUNet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    logs = []
    state, _ = run_reinforce(cfg, params, use_mesh=False, log=logs.append)
    assert int(state.step) == 2
    assert any("Eval reward" in ln for ln in logs)
    if variant == "value":
        # the value head actually trained: params exist and are finite
        leaves = jax.tree_util.tree_leaves(state.value_params)
        assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_reinforce_evals_when_epoch_shorter_than_eval_every(tmp_path,
                                                            tiny_dataset):
    """Regression (round 5): batch_count resets per epoch, so a run whose
    epoch has fewer steps than eval_every used to finish with NO evals and
    NO best checkpoint (the batch-32 run: 32 steps/epoch vs eval_every
    100). The stride is capped at steps_per_epoch — at least one eval per
    epoch, always."""
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.train.reinforce import run_reinforce

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)
    cfg.rl.eval_every = 1000  # far beyond the 2 steps this epoch has
    model = EdgeUNet()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    logs = []
    run_reinforce(cfg, params, use_mesh=False, log=logs.append)
    assert any("Eval reward" in ln for ln in logs)
    jsonls = list((tmp_path / "results").glob("metrics_*.jsonl"))
    assert jsonls and jsonls[0].stat().st_size > 0


def test_pretrain_resume_continues_from_checkpoint(tmp_path, tiny_dataset):
    """Preemption recovery: a resumed run restores params + optimizer +
    step and skips the epochs the checkpoint already finished."""
    from image_compression_tpu.train.pretrain import run_pretraining

    train, val = tiny_dataset
    cfg = tiny_cfg(tmp_path, train, val)
    cfg.pretrain.epochs = 1
    state1, run1 = run_pretraining(cfg, use_mesh=False, log=lambda *a: None)
    assert int(state1.step) == 2

    ckpt_path = tmp_path / "results" / f"fcn_pretrained_{run1}_final"
    cfg.pretrain.epochs = 2
    logs = []
    state2, _ = run_pretraining(cfg, use_mesh=False, log=logs.append,
                                resume=str(ckpt_path))
    assert any("resumed" in ln for ln in logs)
    assert int(state2.step) == 4  # one more epoch of 2 steps
