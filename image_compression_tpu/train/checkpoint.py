"""Checkpointing: params + optimizer state + step, via orbax.

Upgrade over the reference, which torch::save's only the module (optimizer
state is never saved — pretraining.cpp:376-395, training.cpp:230-237) under
unix-timestamp run ids. We keep the same run-id naming scheme
(<phase>_<run_id>_{best,epoch_N,final}) but checkpoint the full train state
so runs resume exactly.
"""

from __future__ import annotations

import pathlib
import time

import jax
import orbax.checkpoint as ocp


def new_run_id() -> str:
    """Unix-timestamp run id (pretraining.cpp:271)."""
    return str(int(time.time()))


class CheckpointManager:
    def __init__(self, directory: str | pathlib.Path, phase: str,
                 run_id: str | None = None):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.phase = phase
        self.run_id = run_id or new_run_id()
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> pathlib.Path:
        return self.directory / f"{self.phase}_{self.run_id}_{tag}"

    def save(self, tag: str, state) -> pathlib.Path:
        path = self._path(tag)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, tag: str, template):
        return self._ckptr.restore(self._path(tag), target=template)

    @staticmethod
    def restore_path(path: str | pathlib.Path, template):
        return ocp.StandardCheckpointer().restore(
            pathlib.Path(path).absolute(), target=template)


def save_params(path: str | pathlib.Path, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(pathlib.Path(path).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | pathlib.Path, template=None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(pathlib.Path(path).absolute(), target=template)


def tree_equal(a, b) -> bool:
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    if len(leaves_a) != len(leaves_b):
        return False
    import numpy as np
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(leaves_a, leaves_b))
