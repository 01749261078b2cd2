"""Orbax checkpointing — save AND restore actually wired.

The reference pickles whole model objects per expert when the WS metric beats
a threshold (expertsim/train/hooks.py:102-165, training_utils.py:291-381) but
its restore path ``load_checkpoint_weights`` is never invoked
(training_setup.py:70-214; SURVEY.md §3.5) — resume only rewinds the epoch
counter. zdcsim persists the full :class:`MoETrainState` (params, EMA
shadows, optimizer moments, SN/BN stats, step counter) with Orbax and
restores it on resume, keeping the reference's config surface
(``checkpoint_experiment_dir``, ``epoch_to_load``,
``ws_threshold_model_save``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from zdcsim.train.state import MoETrainState

CKPT_PREFIX = "state_epoch_"


def checkpoint_dir(dir_models: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(dir_models), f"{CKPT_PREFIX}{epoch}")


def save_checkpoint(dir_models: str, epoch: int, state: MoETrainState) -> str:
    path = checkpoint_dir(dir_models, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


class AsyncSaver:
    """Async Orbax saves: device->host copy happens synchronously inside
    ``save`` (so the train loop may immediately donate/overwrite the state),
    disk writes proceed in a background thread. The reference blocks training
    for every whole-object ``torch.save`` (training_utils.py:316-378)."""

    def __init__(self):
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, dir_models: str, epoch: int, state: MoETrainState) -> str:
        path = checkpoint_dir(dir_models, epoch)
        # Wait for any in-flight save first: one background write at a time
        # keeps disk/host memory bounded.
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return path

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.close()


def delete_checkpoint(dir_models: str, epoch: int) -> None:
    import shutil

    path = checkpoint_dir(dir_models, epoch)
    if os.path.isdir(path):
        shutil.rmtree(path)


def restore_checkpoint(dir_models: str, epoch: int, template: MoETrainState) -> MoETrainState:
    """Restore into the shape/dtype structure of ``template`` (a freshly
    initialized state from the same config)."""
    path = checkpoint_dir(dir_models, epoch)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def latest_epoch(dir_models: str) -> Optional[int]:
    if not os.path.isdir(dir_models):
        return None
    epochs = [
        int(d[len(CKPT_PREFIX):])
        for d in os.listdir(dir_models)
        if d.startswith(CKPT_PREFIX) and d[len(CKPT_PREFIX):].isdigit()
    ]
    return max(epochs) if epochs else None
