"""Loss functions for the MoE conditional GAN, as pure masked-static-shape ops.

The reference subsets each batch per expert with boolean indexing and runs one
backward per expert (expertsim/models/moe.py:121-207) — data-dependent shapes
XLA cannot compile. Here every loss takes a float ``mask`` over the full batch
(1.0 where the sample is routed to the expert under consideration) and
computes masked means, so one jitted program covers all experts with exact
static shapes. With ``mask=None`` the functions reduce over the whole batch.

Numerical semantics match the cited reference formulas; deliberate divergences
are documented inline (the reference has two weighting quirks).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-5


def _bcast_mask(mask: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Reshape a [B] mask to broadcast against x of shape [B, ...]."""
    return mask.reshape(mask.shape[0], *([1] * (x.ndim - 1)))


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x over samples where mask==1 (all elements of those samples)."""
    if mask is None:
        return jnp.mean(x)
    m = _bcast_mask(mask, x)
    denom = jnp.maximum(jnp.sum(mask), 1.0) * (x.size / x.shape[0])
    return jnp.sum(x * m) / denom


def masked_std(x: jnp.ndarray, mask: Optional[jnp.ndarray], ddof: int = 1) -> jnp.ndarray:
    """Masked standard deviation over [B] values (ddof=1 matches torch .std())."""
    if mask is None:
        n = jnp.asarray(x.size, x.dtype)
        mu = jnp.mean(x)
        var = jnp.sum((x - mu) ** 2) / jnp.maximum(n - ddof, 1.0)
        return jnp.sqrt(var)
    x = x.reshape(x.shape[0])
    n = jnp.sum(mask)
    mu = jnp.sum(x * mask) / jnp.maximum(n, 1.0)
    var = jnp.sum(mask * (x - mu) ** 2) / jnp.maximum(n - ddof, 1.0)
    return jnp.sqrt(var)


# ---------------------------------------------------------------------------
# GAN losses (hinge, reference moe.py:517-523, 544)
# ---------------------------------------------------------------------------

def hinge_discriminator_loss(
    real_scores: jnp.ndarray,
    fake_scores: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``relu(1 - D(real)).mean() + relu(1 + D(fake)).mean()`` over routed samples."""
    real_scores = real_scores.reshape(real_scores.shape[0])
    fake_scores = fake_scores.reshape(fake_scores.shape[0])
    loss_real = masked_mean(jax.nn.relu(1.0 - real_scores), mask)
    loss_fake = masked_mean(jax.nn.relu(1.0 + fake_scores), mask)
    return loss_real + loss_fake


def hinge_generator_loss(
    fake_scores: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """``-D(fake).mean()`` over routed samples."""
    return -masked_mean(fake_scores.reshape(fake_scores.shape[0]), mask)


# ---------------------------------------------------------------------------
# SDI-GAN diversity regularization (reference moe.py:573-588)
# ---------------------------------------------------------------------------

def sdi_gan_regularization(
    fake_latent: jnp.ndarray,
    fake_latent_2: jnp.ndarray,
    noise: jnp.ndarray,
    noise_2: jnp.ndarray,
    std: jnp.ndarray,
    di_strength: float,
    mask: Optional[jnp.ndarray] = None,
    pairwise_quirk: bool = False,
) -> jnp.ndarray:
    """Per-sample diversity regularizer from SDI-GAN.

    Two latents from two noise draws; diversity ratio
    ``div_i = mean|l1_i - l2_i| / (mean|z1_i - z2_i| + 1e-5)``; the loss pushes
    ``div`` up where the data's per-condition stddev target ``std_i`` is large:
    ``loss = mean(std) * mean(std_i / (div_i + 1e-5)) * di_strength``.

    ``pairwise_quirk=True`` reproduces the reference's accidental broadcast
    (``std`` is [B,1], ``div`` is [B]; torch broadcasts to [B,B] before the
    mean — moe.py:583-586 — which factorizes the loss into
    ``mean(std)^2 * mean(1/(div+eps))``). Default is the intended per-sample
    pairing; the quirk is available for bit-parity studies.
    """
    std = std.reshape(std.shape[0])
    abs_diff_latent = jnp.mean(jnp.abs(fake_latent - fake_latent_2), axis=1)
    abs_diff_noise = jnp.mean(jnp.abs(noise - noise_2), axis=1)
    div = abs_diff_latent / (abs_diff_noise + _EPS)
    if pairwise_quirk:
        per_sample = masked_mean(std, mask) * masked_mean(1.0 / (div + _EPS), mask)
    else:
        per_sample = masked_mean(std / (div + _EPS), mask)
    return masked_mean(std, mask) * per_sample * di_strength


# ---------------------------------------------------------------------------
# Intensity (photon-sum) regularization (reference moe.py:590-642)
# ---------------------------------------------------------------------------

def intensity_regularization(
    fake_images: jnp.ndarray,
    intensity_target: jnp.ndarray,
    in_strength: float,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MAE between generated photon sums and targets, in linear space.

    Images are log-space; photon sum per image is ``sum(exp(img) - 1)`` over
    H,W (moe.py:611-616). Returns (loss, per-image sums [B], masked std of
    sums, masked mean of sums) — the mean/std feed the router's
    differentiation loss and the epoch metrics.
    """
    b = fake_images.shape[0]
    sums = jnp.sum(jnp.expm1(fake_images.reshape(b, -1)), axis=1)
    target = intensity_target.reshape(b)
    loss = masked_mean(jnp.abs(sums - target), mask) * in_strength
    return loss, sums, masked_std(sums, mask), masked_mean(sums, mask)


# ---------------------------------------------------------------------------
# Auxiliary coordinate regressor loss (reference proton/aux_reg.py:42-45)
# ---------------------------------------------------------------------------

def log_cosh_loss(
    true_coords: jnp.ndarray,
    pred_coords: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically stable log-cosh: ``mean(d + softplus(-2d) - log 2)``."""
    d = pred_coords - true_coords
    elem = d + jax.nn.softplus(-2.0 * d) - math.log(2.0)
    return masked_mean(elem, mask)


# ---------------------------------------------------------------------------
# Router losses (reference train/utils.py:372-419,623-642; moe.py:395-434)
# ---------------------------------------------------------------------------

def expert_utilization_entropy(gates_soft: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
    """Entropy of the batch-mean gate distribution, scaled by strength.

    The router loss uses the negative of this (maximize utilization entropy),
    reference moe.py:258-262 + train/utils.py:405-419.
    """
    avg = jnp.mean(gates_soft, axis=0)
    entropy = -jnp.sum(avg * jnp.log(avg + 1e-9))
    return entropy * strength


def expert_distribution_loss(
    gating_probs: jnp.ndarray, features: jnp.ndarray, lambda_reg: float = 0.1
) -> jnp.ndarray:
    """Pairwise (gate-similarity x feature-distance) penalty.

    ``sum((G G^T) * cdist(F)) / B * lambda_reg`` — reference
    train/utils.py:372-395 (lambda_reg=0.1 default there too; the config's
    ``ed_strength`` multiplies on top).
    """
    sq = jnp.sum(features**2, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (features @ features.T)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-12)
    sims = gating_probs @ gating_probs.T
    return jnp.sum(sims * dist) / gating_probs.shape[0] * lambda_reg


def differentiation_loss(mean_intensities: jnp.ndarray) -> jnp.ndarray:
    """Sum over expert pairs of |mean_intensity_i - mean_intensity_j|.

    The router *minimizes the negative* of this to push experts toward
    different photon-sum regimes (moe.py:395-405). Note two reference quirks
    handled by callers, not here: (a) the operands are detached so no gradient
    reaches the router; (b) the reference multiplies by ``diff_strength``
    twice (moe.py:399 and :405) — we apply it once.
    """
    e = mean_intensities.shape[0]
    ii, jj = jnp.triu_indices(e, k=1)
    return jnp.sum(jnp.abs(mean_intensities[ii] - mean_intensities[jj]))


def adaptive_load_balancing_loss(
    routing_scores: jnp.ndarray, alb_strength: float, eps: float = 1e-6
) -> jnp.ndarray:
    """``mean(exp(1 / (sum_batch gates_e + eps))) * strength`` — starvation
    penalty that explodes for unused experts (train/utils.py:623-642)."""
    return jnp.mean(jnp.exp(1.0 / (routing_scores + eps))) * alb_strength


# ---------------------------------------------------------------------------
# Schedules (reference moe.py:62-74, 407-434)
# ---------------------------------------------------------------------------

def tau_schedule(epoch, tau_start: float, tau_min: float, tau_decay: float):
    """Gumbel temperature: ``max(tau_min, tau_start * tau_decay^epoch)``."""
    return jnp.maximum(tau_min, tau_start * tau_decay ** jnp.asarray(epoch, jnp.float32))


def alb_annealing_weight(epoch, alpha: int, min_weight: float):
    """Annealed ALB weight: ramps ``min_weight -> 1`` over ``alpha`` epochs
    (reference moe.py:413-421: ``min_weight + (1-min_weight)*clip(epoch/alpha)``)."""
    frac = jnp.clip(jnp.asarray(epoch, jnp.float32) / float(alpha), 0.0, 1.0)
    return min_weight + (1.0 - min_weight) * frac
