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
    """Per-leaf rule INSIDE an expert-stacked component: array leaves carry a
    leading ``[E, ...]`` axis by nn.vmap construction and shard over
    ``expert``; scalar bookkeeping (Adam step counts) replicates."""
    expert_s = NamedSharding(mesh, P(EXPERT_AXIS))
    repl = replicated(mesh)

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] == n_experts and n_experts > 1:
            return expert_s
        return repl

    return rule


def state_shardings(mesh: Mesh, state: Any, n_experts: int) -> Any:
    """Sharding pytree for a MoETrainState.

    Structural, not shape-based: only the expert-stacked subtrees
    (``state.{gen,disc,aux}`` and ``ema_gen_params`` — exactly the components
    built via ``stack_experts``) shard their leading ``[E, ...]`` axis over
    the expert mesh axis; the router, the step counter, and EVERYTHING else
    replicate even if a leaf coincidentally has a leading dim of
    ``n_experts`` (e.g. the router head's ``(E,)`` logit bias).

    Accepts either a full MoETrainState or any pytree with
    ``gen/disc/aux/router`` attributes; falls back to replicating unknown
    structures wholesale.
    """
    rule = _expert_leaf_sharding(mesh, n_experts)
    repl = replicated(mesh)
    if not all(hasattr(state, a) for a in ("gen", "disc", "aux", "router")):
        return jax.tree_util.tree_map(lambda _: repl, state)

    expert_shard = lambda sub: jax.tree_util.tree_map(rule, sub)
    replicate = lambda sub: jax.tree_util.tree_map(lambda _: repl, sub)
    return state.replace(
        gen=expert_shard(state.gen),
        disc=expert_shard(state.disc),
        aux=expert_shard(state.aux),
        router=replicate(state.router),
        ema_gen_params=expert_shard(state.ema_gen_params),
        step=repl,
    )


def shard_state(mesh: Mesh, state: Any, n_experts: int) -> Any:
    """Place a host/single-device state onto the mesh per state_shardings."""
    shardings = state_shardings(mesh, state, n_experts)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
