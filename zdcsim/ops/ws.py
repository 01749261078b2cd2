"""1-D Wasserstein distance in JAX.

The reference computes its north-star fidelity metric with
``scipy.stats.wasserstein_distance`` on the CPU (train/utils.py:160-168).
Here the same quantity — the L1 distance between empirical CDFs with uniform
weights — is computed on-device so evaluation never leaves the accelerator.
``wasserstein_1d`` matches scipy to float32 precision for arbitrary (static)
sample counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """W1 distance between the empirical distributions of 1-D samples u, v.

    Equivalent to ``scipy.stats.wasserstein_distance(u, v)``: integrates
    ``|CDF_u - CDF_v|`` over the merged support.
    """
    u = jnp.sort(u.reshape(-1))
    v = jnp.sort(v.reshape(-1))
    if u.shape[0] == v.shape[0]:
        # Equal sample counts: W1 reduces to the mean absolute difference of
        # order statistics.
        return jnp.mean(jnp.abs(u - v))
    all_vals = jnp.sort(jnp.concatenate([u, v]))
    deltas = jnp.diff(all_vals)
    cdf_u = jnp.searchsorted(u, all_vals[:-1], side="right") / u.shape[0]
    cdf_v = jnp.searchsorted(v, all_vals[:-1], side="right") / v.shape[0]
    return jnp.sum(jnp.abs(cdf_u - cdf_v) * deltas)


@jax.jit
def wasserstein_per_channel(ch_real: jnp.ndarray, ch_gen: jnp.ndarray) -> jnp.ndarray:
    """Per-channel W1 for ``[N, C]`` vs ``[M, C]`` channel-sum matrices.

    Returns ``[C]`` distances (the reference loops channels 0..4,
    train/utils.py:160-162).
    """
    return jax.vmap(wasserstein_1d, in_axes=(1, 1))(ch_real, ch_gen)


def masked_wasserstein_1d(
    u: jnp.ndarray, u_mask: jnp.ndarray, v: jnp.ndarray, v_mask: jnp.ndarray
) -> jnp.ndarray:
    """W1 between masked subsets of equal-length padded sample vectors.

    Static-shape variant used for per-expert WS: invalid entries are pushed to
    +inf before sorting and the CDFs renormalize by the true counts. Needed
    because per-expert sample counts are data-dependent under jit.
    """
    big = jnp.asarray(jnp.inf, u.dtype)
    u_sorted = jnp.sort(jnp.where(u_mask > 0, u, big))
    v_sorted = jnp.sort(jnp.where(v_mask > 0, v, big))
    n_u = jnp.maximum(jnp.sum(u_mask), 1.0)
    n_v = jnp.maximum(jnp.sum(v_mask), 1.0)

    all_vals = jnp.sort(jnp.concatenate([u_sorted, v_sorted]))
    total = jnp.sum(u_mask) + jnp.sum(v_mask)
    # Only positions strictly inside the valid merged support contribute.
    pos = jnp.arange(all_vals.shape[0] - 1)
    valid = pos < (total - 1)
    deltas = jnp.where(valid, jnp.diff(all_vals), 0.0)
    deltas = jnp.where(jnp.isfinite(deltas), deltas, 0.0)
    cdf_u = jnp.searchsorted(u_sorted, all_vals[:-1], side="right") / n_u
    cdf_v = jnp.searchsorted(v_sorted, all_vals[:-1], side="right") / n_v
    cdf_u = jnp.minimum(cdf_u, 1.0)
    cdf_v = jnp.minimum(cdf_v, 1.0)
    result = jnp.sum(jnp.abs(cdf_u - cdf_v) * deltas)
    # An empty side has no empirical distribution: report 0 like the
    # reference does for expert slices with no samples (train/utils.py:164-166)
    # rather than a bogus CDF-vs-zero distance.
    both = (jnp.sum(u_mask) > 0) & (jnp.sum(v_mask) > 0)
    return jnp.where(both, result, 0.0)
