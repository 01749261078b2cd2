"""Mesh construction and sharding rules for the MoE-GAN train state."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_mesh(
    n_devices: Optional[int] = None,
    expert_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, expert)`` mesh over the available devices.

    ``expert_parallel`` devices along the expert axis (must divide both the
    device count and ``n_experts``); the rest go to data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % expert_parallel != 0:
        raise ValueError(f"expert_parallel={expert_parallel} does not divide {n} devices")
    grid = np.array(devices).reshape(n // expert_parallel, expert_parallel)
    return Mesh(grid, (DATA_AXIS, EXPERT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays shard their leading (sample) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _expert_leaf_sharding(mesh: Mesh, n_experts: int):
    """Leaves with a leading expert axis shard it over ``expert``; everything
    else replicates."""
    expert_s = NamedSharding(mesh, P(EXPERT_AXIS))
    repl = replicated(mesh)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == n_experts and n_experts > 1:
            return expert_s
        return repl

    return rule


def state_shardings(mesh: Mesh, state: Any, n_experts: int) -> Any:
    """Sharding pytree for a MoETrainState: expert-stacked leaves over the
    expert axis, router/scalars replicated."""
    rule = _expert_leaf_sharding(mesh, n_experts)
    return jax.tree_util.tree_map(rule, state)


def shard_state(mesh: Mesh, state: Any, n_experts: int) -> Any:
    """Place a host/single-device state onto the mesh per state_shardings."""
    shardings = state_shardings(mesh, state, n_experts)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
