"""Multi-host data parallelism: two real processes through
jax.distributed (SURVEY.md section 2 parallelism table: DP across ICI *and
DCN* — this exercises the multi-process path the single-process suite cannot,
using the coordinator service + gloo CPU collectives as the stand-in for
DCN). Each process holds half the global batch, runs one sharded pretrain
step via initialize_distributed -> make_mesh -> make_pretrain_step, and the
resulting loss must (a) agree across processes and (b) match a single-process
run of the same global batch bit-for-bit in float32 tolerance."""

import os
import pathlib
import re
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
pid = int(sys.argv[1])
port = sys.argv[2]
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from image_compression_tpu.parallel.mesh import (initialize_distributed,
                                                 make_mesh, replicate)
if pid >= 0:
    initialize_distributed(f"localhost:{port}", 2, pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from image_compression_tpu.config import Config
from image_compression_tpu.models.unet import EdgeUNet
from image_compression_tpu.train.steps import (init_train_state,
                                               make_pretrain_optimizer,
                                               make_pretrain_step)
from image_compression_tpu.ops.targets import create_target_with_mask

cfg = Config()
size, global_batch = 32, 4
model = EdgeUNet(dtype=jnp.float32)
tx = make_pretrain_optimizer(cfg)
state = init_train_state(model, tx, jax.random.PRNGKey(0),
                         jnp.zeros((1, size, size, 3)))

rng = np.random.default_rng(7)
all_images = rng.random((global_batch, size, size, 3)).astype(np.float32)

mesh = make_mesh()
state = replicate(mesh, state)
targets_full = np.asarray(create_target_with_mask(
    jnp.asarray(all_images), cfg.edge_target))

if pid >= 0:  # distributed: each process contributes its half
    half = global_batch // 2
    sl = slice(pid * half, (pid + 1) * half)
    sharding = NamedSharding(mesh, P("data"))
    images = jax.make_array_from_process_local_data(
        sharding, all_images[sl], all_images.shape)
    targets = jax.make_array_from_process_local_data(
        sharding, targets_full[sl], targets_full.shape)
else:  # single-process reference
    images = jnp.asarray(all_images)
    targets = jnp.asarray(targets_full)

step = make_pretrain_step(model, tx, cfg)
state2, aux, _m = step(state, images, targets)
print(f"LOSS {float(aux['loss']):.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=str(pathlib.Path(__file__).parents[1]),
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)

    def run(pid, port):
        return subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)

    port = "46123"
    p0, p1 = run(0, port), run(1, port)
    out0, _ = p0.communicate(timeout=600)
    out1, _ = p1.communicate(timeout=600)
    assert p0.returncode == 0, out0
    assert p1.returncode == 0, out1

    ref = run(-1, port)
    out_ref, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, out_ref

    def loss(out):
        m = re.search(r"LOSS ([-\d.]+)", out)
        assert m, out
        return float(m.group(1))

    l0, l1, lr = loss(out0), loss(out1), loss(out_ref)
    assert l0 == l1, (l0, l1)
    assert abs(l0 - lr) < 1e-4, (l0, lr)
