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
