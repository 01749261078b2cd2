"""Gumbel-softmax routing primitives.

Functional equivalents of ``F.gumbel_softmax`` + the straight-through trick
the reference applies in its train step (expertsim/models/moe.py:97-103,
routers/router.py:21-26), with explicit PRNG keys.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gumbel_softmax(
    key: jax.Array, logits: jnp.ndarray, tau: float = 1.0, hard: bool = False
) -> jnp.ndarray:
    """Sample gumbel-softmax gates from logits ``[B, E]``."""
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        return straight_through_gates(y_soft)[0]
    return y_soft


def straight_through_gates(gates_soft: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-hot forward / soft backward gates.

    Returns ``(gates, idx)`` where ``gates = one_hot(argmax) + soft -
    stop_grad(soft)`` and ``idx`` is the hard expert assignment per sample.
    """
    idx = jnp.argmax(gates_soft, axis=-1)
    hard = jax.nn.one_hot(idx, gates_soft.shape[-1], dtype=gates_soft.dtype)
    gates = hard + gates_soft - jax.lax.stop_gradient(gates_soft)
    return gates, idx


def expert_masks(idx: jnp.ndarray, n_experts: int, dtype=jnp.float32) -> jnp.ndarray:
    """``[E, B]`` float masks from hard assignments ``[B]``."""
    return (idx[None, :] == jnp.arange(n_experts)[:, None]).astype(dtype)


def class_share(idx: jnp.ndarray, n_experts: int) -> jnp.ndarray:
    """Fraction of the batch routed to each expert (``[E]``), the per-expert
    loss weight ``w`` in the reference (moe.py:99-100, 522, 562)."""
    counts = jnp.sum(idx[None, :] == jnp.arange(n_experts)[:, None], axis=1)
    return counts.astype(jnp.float32) / idx.shape[0]
