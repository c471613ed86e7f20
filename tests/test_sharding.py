"""Multi-device data parallelism on the virtual 8-device CPU mesh: sharded
batches produce the same numerics as single-device, and the driver's
dryrun_multichip contract executes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_compression_tpu.config import Config
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                 replicate, shard_batch)
from image_compression_tpu.train.steps import (init_train_state,
                                               make_pretrain_optimizer,
                                               make_pretrain_step)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def test_batch_sharding_places_shards(mesh):
    x = jnp.zeros((16, 8, 8, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.addressable_shards) == 8
    assert xs.addressable_shards[0].data.shape == (2, 8, 8, 3)


def test_sharded_pretrain_step_matches_single(mesh):
    cfg = Config()
    model = EdgeUNet(dtype=jnp.float32)
    tx = make_pretrain_optimizer(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, 16, 16, 3), np.float32))
    targets = np.zeros((8, 16, 16, 4), np.float32)
    targets[..., 0] = 1.0
    targets[..., 2:] = 1.0
    targets = jnp.asarray(targets)

    state = init_train_state(model, tx, jax.random.PRNGKey(0), images[:1])
    step = make_pretrain_step(model, tx, cfg)

    _, aux_single, _ = step(state, images, targets)

    state_r = replicate(mesh, state)
    images_s, targets_s = shard_batch(mesh, (images, targets))
    _, aux_sharded, _ = step(state_r, images_s, targets_s)

    np.testing.assert_allclose(float(aux_single["loss"]),
                               float(aux_sharded["loss"]), rtol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, (params, images) = ge.entry()
    out = jax.jit(fn)(params, images[:1])
    assert out.shape[0] == 1
