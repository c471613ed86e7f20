"""End-to-end smoke on real TPU hardware: a few pretraining steps, one
REINFORCE step, and a compress -> reassemble round trip. Prints OK lines
with timings; exits nonzero on any failure.

Run: PYTHONPATH=. python benchmarks/tpu_smoke.py
"""

import pathlib
import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from image_compression_tpu.config import Config, EdgeTarget
    from image_compression_tpu.io.image_io import ensure_rgba
    from image_compression_tpu.io.reassemble import reassemble_array
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.pipeline import (classical_costs_signed,
                                                compress_arrays)
    from image_compression_tpu.train.steps import (init_rl_state,
                                                   init_train_state,
                                                   make_pretrain_optimizer,
                                                   make_pretrain_step,
                                                   make_rl_optimizer,
                                                   make_rl_step)
    from image_compression_tpu.ops.targets import create_target_with_mask

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    cfg = Config()
    cfg.reward.max_segments = 32

    size = 256
    base = rng.normal(size=(8, size // 32, size // 32, 3))
    imgs = np.kron(base, np.ones((1, 32, 32, 1)))[:, :size, :size]
    imgs += 0.05 * rng.normal(size=imgs.shape)
    imgs = ((imgs - imgs.min()) / (imgs.max() - imgs.min())).astype(np.float32)
    images = jnp.asarray(imgs)

    model = EdgeUNet()
    params = model.init(jax.random.PRNGKey(0), images[:1])

    # --- pretraining steps -------------------------------------------------
    tx = make_pretrain_optimizer(cfg)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), images[:1])
    step = make_pretrain_step(model, tx, cfg)
    targets = jax.jit(lambda im: create_target_with_mask(
        im, EdgeTarget.CANNY))(images)
    t0 = time.time()
    losses = []
    for _ in range(3):
        state, aux, _m = step(state, images, targets)
        losses.append(float(aux["loss"]))
    print(f"OK pretrain 3 steps ({time.time() - t0:.1f}s) losses="
          f"{[round(x, 4) for x in losses]}")
    assert losses[-1] < losses[0], "loss did not decrease"

    # --- one REINFORCE step ------------------------------------------------
    tx_rl = make_rl_optimizer(cfg)
    rl_state = init_rl_state(state.params, tx_rl)
    rl_step = make_rl_step(model, tx_rl, cfg)
    sizes = jnp.full((8,), 120_000.0)
    t0 = time.time()
    rl_state, aux = rl_step(rl_state, jax.random.PRNGKey(1), images, sizes)
    reward = float(aux["reward_mean"])
    print(f"OK rl step ({time.time() - t0:.1f}s) reward_mean={reward:.4f}")
    assert np.isfinite(reward)

    # --- compress -> reassemble round trip ---------------------------------
    img_u8 = (imgs[0] * 255).round().astype(np.uint8)
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        dirs = compress_arrays(
            [img_u8], lambda b: classical_costs_signed(b, EdgeTarget.CANNY),
            cfg, tmp, ["smoke"])
        canvas = reassemble_array(dirs[0])
        n_slices = len(list(pathlib.Path(dirs[0]).glob("slice_*.png")))
        ok = np.array_equal(canvas, ensure_rgba(img_u8))
        print(f"OK compress/reassemble ({time.time() - t0:.1f}s) "
              f"slices={n_slices} lossless={ok}")
        assert ok, "round trip not lossless"

    print("OK all")


if __name__ == "__main__":
    sys.exit(main())
