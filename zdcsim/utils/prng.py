"""PRNG discipline for zdcsim.

The reference relies on implicit global torch RNG (torch.randn everywhere,
e.g. expertsim/models/moe.py:144). Here every random draw takes an explicit
``jax.random`` key, derived deterministically from (seed, epoch, step) so runs
are reproducible and resumable, and per-device keys are folded from the device
index so data-parallel replicas draw independent noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_iterator(seed: int):
    """Infinite iterator of fresh PRNG keys from a base seed."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def fold_epoch_batch(key: jax.Array, epoch, batch_idx) -> jax.Array:
    """Deterministic per-(epoch, batch) key."""
    return jax.random.fold_in(jax.random.fold_in(key, epoch), batch_idx)


def split_tree(key: jax.Array, n: int):
    """Split into n keys, returned as a tuple."""
    return tuple(jax.random.split(key, n))


def gumbel(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard Gumbel(0,1) noise."""
    return jax.random.gumbel(key, shape, dtype)
