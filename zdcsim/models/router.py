"""Router networks: conditioning vector -> expert logits.

Gumbel-softmax sampling lives in ``zdcsim.ops.routing`` (explicit PRNG keys);
the modules here only produce logits plus convenience gate outputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from zdcsim.models.layers import leaky_relu
from zdcsim.ops.routing import gumbel_softmax


class RouterNetwork(nn.Module):
    """MLP router (reference "router-architecture-2",
    expertsim/models/routers/router.py:6-26): cond[9] -> 128 -> 64 -> 32 ->
    n_experts with LeakyReLU(0.1), followed by gumbel-softmax gates.

    With ``key=None`` the gates are the deterministic ``softmax(logits/tau)``
    (the reference samples gumbel noise even at eval, moe.py:650; we default
    eval to deterministic routing and keep sampling available via ``key``).
    """

    n_experts: int = 3

    @nn.compact
    def __call__(
        self,
        cond: jnp.ndarray,
        tau: float = 1.0,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = cond
        for feats in (128, 64, 32):
            x = nn.Dense(feats)(x)
            x = leaky_relu(x)
        logits = nn.Dense(self.n_experts)(x)
        if key is None:
            gates = jax.nn.softmax(logits / tau, axis=-1)
        else:
            gates = gumbel_softmax(key, logits, tau=tau)
        return gates, logits


class AttentionRouterNetwork(nn.Module):
    """Attention router over learned expert queries.

    The reference registry names ``router.AttentionRouterNetwork``
    (models/__init__.py:21) but the class does not exist in its tree — an
    import-time bug. This implements the intended capability: the
    conditioning vector is embedded and attends to per-expert learned query
    embeddings; the scaled dot-product scores are the routing logits.
    """

    n_experts: int = 3
    embed_dim: int = 64

    @nn.compact
    def __call__(
        self,
        cond: jnp.ndarray,
        tau: float = 1.0,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = nn.Dense(128)(cond)
        h = leaky_relu(h)
        h = nn.Dense(self.embed_dim)(h)
        h = nn.LayerNorm()(h)

        expert_queries = self.param(
            "expert_queries",
            nn.initializers.normal(stddev=0.02),
            (self.n_experts, self.embed_dim),
        )
        logits = (h @ expert_queries.T) / jnp.sqrt(float(self.embed_dim))
        if key is None:
            gates = jax.nn.softmax(logits / tau, axis=-1)
        else:
            gates = gumbel_softmax(key, logits, tau=tau)
        return gates, logits
