"""The minimum end-to-end slice (SURVEY.md section 7 phase 5): compress ->
reassemble a blocky image with classical Canny costs, bit-exact round trip.
Plus the full RL train-step smoke test (section 4(f)) and the multi-chip
dry run."""

import jax
import jax.numpy as jnp
import numpy as np

from image_compression_tpu.config import Config, EdgeTarget
from image_compression_tpu.io.image_io import ensure_rgba
from image_compression_tpu.io.reassemble import reassemble_array
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.pipeline import (classical_costs_signed,
                                            compress_arrays, learned_costs,
                                            segment_batch)
from image_compression_tpu.train.steps import (init_rl_state,
                                               init_train_state,
                                               make_pretrain_optimizer,
                                               make_pretrain_step,
                                               make_rl_eval,
                                               make_rl_optimizer,
                                               make_rl_step)


def blocky(rng, h=64, w=64):
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :] = (60, 100, 150)
    img[10:40, 12:50] = (200, 50, 40)
    img[35:60, 4:28] = (70, 210, 110)
    img = img + rng.normal(0, 2, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def small_cfg():
    cfg = Config()
    cfg.multicut.max_rounds = 16
    cfg.multicut.icm_sweeps = 2
    cfg.reward.max_segments = 16
    # these tests exercise the multi-slice machinery; the single-slice
    # fallback has its own suite (test_fallback.py)
    cfg.compress_fallback = False
    return cfg


def test_classical_compress_roundtrip(tmp_path, rng):
    """BASELINE.json config #1: classical Canny costs, CPU-runnable,
    bit-exact compress -> reassemble."""
    cfg = small_cfg()
    img = blocky(rng)
    cost_fn = lambda b: classical_costs_signed(b, EdgeTarget.CANNY)  # noqa
    dirs = compress_arrays([img], cost_fn, cfg, tmp_path, ["case"])
    canvas = reassemble_array(dirs[0])
    np.testing.assert_array_equal(canvas, ensure_rgba(img))
    # segmentation is non-trivial: more than one slice
    n_slices = len(list(dirs[0].glob("slice_*.png")))
    assert n_slices >= 2


def test_learned_compress_roundtrip(tmp_path, rng):
    """Same round trip through the (untrained) U-Net path."""
    cfg = small_cfg()
    img = blocky(rng, 32, 32)
    model = EdgeUNet(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    cost_fn = lambda b: learned_costs(model, params, b)  # noqa: E731
    dirs = compress_arrays([img], cost_fn, cfg, tmp_path, ["learned"])
    canvas = reassemble_array(dirs[0])
    np.testing.assert_array_equal(canvas, ensure_rgba(img))


def test_segment_batch_shapes(rng):
    costs = jnp.asarray(rng.normal(size=(2, 16, 16, 2)).astype(np.float32))
    labels = segment_batch(costs, max_rounds=8, icm_sweeps=1)
    assert labels.shape == (2, 16, 16)


def test_pretrain_step_decreases_loss(rng):
    cfg = small_cfg()
    model = EdgeUNet(dtype=jnp.float32)
    tx = make_pretrain_optimizer(cfg)
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    targets = np.zeros((2, 32, 32, 4), np.float32)
    targets[..., 0] = 1.0
    targets[..., 1] = 1.0
    targets[..., 2:] = 1.0
    targets = jnp.asarray(targets)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), images[:1])
    step = make_pretrain_step(model, tx, cfg)
    losses = []
    for _ in range(5):
        state, aux, _m = step(state, images, targets)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_rl_step_smoke(rng):
    """Fixed-seed REINFORCE step: finite loss, params move, baseline
    initializes to the batch-mean reward (SURVEY.md section 4(f))."""
    cfg = small_cfg()
    model = EdgeUNet(dtype=jnp.float32)
    tx = make_rl_optimizer(cfg)
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    sizes = jnp.asarray([900.0, 1100.0])
    params = model.init(jax.random.PRNGKey(0), images[:1])
    state = init_rl_state(params, tx)
    step = make_rl_step(model, tx, cfg)
    new_state, aux = step(state, jax.random.PRNGKey(7), images, sizes)
    assert np.isfinite(float(aux["loss"]))
    assert bool(new_state.baseline_init)
    np.testing.assert_allclose(float(new_state.baseline),
                               float(aux["reward_mean"]), rtol=1e-5)
    # params actually updated
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p1))
    # determinism with the same key
    state2, aux2 = step(state, jax.random.PRNGKey(7), images, sizes)
    np.testing.assert_allclose(float(aux2["loss"]), float(aux["loss"]),
                               rtol=1e-6)


def test_rl_step_ppo(rng):
    """cfg.rl.ppo_epochs: K=1's clipped surrogate reproduces the REINFORCE
    gradient (ratio == 1 at the first inner epoch), so the updated params
    must match the plain step's; K=3 runs and moves params further."""
    import dataclasses

    cfg = small_cfg()
    model = EdgeUNet(dtype=jnp.float32)
    tx = make_rl_optimizer(cfg)
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    sizes = jnp.asarray([900.0, 1100.0])
    params = model.init(jax.random.PRNGKey(0), images[:1])
    state = init_rl_state(params, tx)

    outs = {}
    for k in (0, 1, 3):
        cfg_k = dataclasses.replace(cfg, rl=dataclasses.replace(
            cfg.rl, ppo_epochs=k))
        step = make_rl_step(model, tx, cfg_k)
        new_state, aux = step(state, jax.random.PRNGKey(7), images, sizes)
        assert np.isfinite(float(aux["loss"]))
        outs[k] = new_state
    # identical sample + advantage (same key/state); K=1 grad == REINFORCE
    for p0, p1 in zip(jax.tree.leaves(outs[0].params),
                      jax.tree.leaves(outs[1].params)):
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                                   rtol=2e-4, atol=2e-6)
    # K=3 actually takes further steps
    moved = any(
        not np.allclose(np.asarray(p1), np.asarray(p3), atol=1e-7)
        for p1, p3 in zip(jax.tree.leaves(outs[1].params),
                          jax.tree.leaves(outs[3].params)))
    assert moved


def test_rl_eval_deterministic(rng):
    cfg = small_cfg()
    model = EdgeUNet(dtype=jnp.float32)
    images = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    sizes = jnp.asarray([900.0, 1100.0])
    params = model.init(jax.random.PRNGKey(0), images[:1])
    ev = make_rl_eval(model, cfg)
    r1 = np.asarray(ev(params, images, sizes))
    r2 = np.asarray(ev(params, images, sizes))
    np.testing.assert_array_equal(r1, r2)
    assert r1.shape == (2,)
