"""Proton ZDC (ZP, 56x30) model family.

Flax re-designs of the reference architectures (cited per class); NHWC
layout, GroupNorm/LayerNorm as in the reference, spectral norm via
power-iteration state in the ``batch_stats`` collection.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from zdcsim.models.layers import (
    GroupNorm2d,
    MLPBlock,
    SNConv,
    SNDense,
    leaky_relu,
    max_pool,
    resize_nearest,
    upsample_nearest,
)

PROTON_SHAPE = (56, 30)


class Generator(nn.Module):
    """Conditional generator for 56x30 proton showers.

    Reference: "Generator-v5-bigkernel-res56x30"
    (expertsim/models/proton/generator.py:5-53): concat(noise[10], cond[9])
    -> FC256(LN, LReLU) -> FC 512*18*10(LN, LReLU) -> reshape 18x10x512
    -> up x2 -> Conv4x4 256 (GN32) -> resize to 56x30 -> Conv4x4 128 (GN32)
    -> Conv3x3 64 (GN32) -> Conv2x2 1 (pad 1) -> ReLU. Output is log-space
    pixel intensities.

    ``width`` scales every channel count (rounded down to a multiple of 32,
    min 32, so GroupNorm keeps 32 groups and MXU lanes stay full). width=1
    is the reference architecture bit-for-bit; width<1 builds the distilled
    serving student (zdcsim/inference/distill.py) with the SAME param-tree
    layout, so the whole fast/int8 serving stack applies unchanged.
    """

    noise_dim: int = 10
    cond_dim: int = 9
    width: float = 1.0

    @nn.compact
    def __call__(self, noise: jnp.ndarray, cond: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        w = lambda c: max(32, int(c * self.width) // 32 * 32)
        x = jnp.concatenate([noise, cond], axis=1)
        x = MLPBlock(256)(x)
        x = MLPBlock(w(512) * 18 * 10)(x)
        x = x.reshape(-1, 18, 10, w(512))

        x = upsample_nearest(x)  # 36x20
        x = nn.Conv(w(256), (4, 4), padding=((1, 1), (1, 1)))(x)  # 35x19
        x = GroupNorm2d(w(256))(x)
        x = leaky_relu(x)

        x = resize_nearest(x, (56, 30))
        x = nn.Conv(w(128), (4, 4), padding=((1, 1), (1, 1)))(x)  # 55x29
        x = GroupNorm2d(w(128))(x)
        x = leaky_relu(x)

        x = nn.Conv(w(64), (3, 3), padding=((1, 1), (1, 1)))(x)  # 55x29
        x = GroupNorm2d(w(64))(x)
        x = leaky_relu(x)

        x = nn.Conv(1, (2, 2), padding=((1, 1), (1, 1)))(x)  # 56x30
        return nn.relu(x)


class Discriminator(nn.Module):
    """Hinge discriminator with spectral norm for 56x30 showers.

    Reference: "Discriminator-5-hinge-spectralnorm"
    (expertsim/models/proton/discriminator.py:116-155): SN Conv3x3 32 (GN8)
    -> pool 2x2 -> SN Conv3x3 16 (GN8) -> pool (2,1) -> flatten ++ cond ->
    SN FC128(LN) -> SN FC64(LN) = latent -> SN FC1 raw score. Returns
    (score, latent); the latent feeds the SDI-GAN diversity term.
    """

    cond_dim: int = 9

    @nn.compact
    def __call__(self, img: jnp.ndarray, cond: jnp.ndarray, train: bool = True):
        x = SNConv(32, (3, 3))(img, train=train)  # 54x28
        x = GroupNorm2d(32, groups=8)(x)
        x = leaky_relu(x)
        x = max_pool(x, (2, 2))  # 27x14

        x = SNConv(16, (3, 3))(x, train=train)  # 25x12
        x = GroupNorm2d(16, groups=8)(x)
        x = leaky_relu(x)
        x = max_pool(x, (2, 1))  # 12x12

        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, cond], axis=1)

        x = SNDense(128)(x, train=train)
        x = nn.LayerNorm()(x)
        x = leaky_relu(x)

        x = SNDense(64)(x, train=train)
        x = nn.LayerNorm()(x)
        latent = leaky_relu(x)

        out = SNDense(1)(latent, train=train)
        return out, latent


class ResidualBlock(nn.Module):
    """GroupNorm residual block (reference proton/aux_reg.py:99-131)."""

    features: int
    kernel_size: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.kernel_size // 2
        pad = ((p, p), (p, p))
        identity = x
        y = nn.Conv(self.features, (self.kernel_size,) * 2, strides=(self.strides,) * 2, padding=pad)(x)
        y = GroupNorm2d(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (self.kernel_size,) * 2, padding=pad)(y)
        y = GroupNorm2d(self.features)(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=(self.strides,) * 2)(x)
            identity = GroupNorm2d(self.features)(identity)
        return nn.relu(y + identity)


class AuxReg(nn.Module):
    """Auxiliary (max_x, max_y) coordinate regressor for proton showers.

    Reference: "regressor_v3_changed_loss_log_cosh"
    (expertsim/models/proton/aux_reg.py:11-96): Conv5x5 s2 feature stem,
    two stride-2 residual blocks with stride-1 max pools between, global
    average pool to 64-d, then a 128->64->2 LayerNorm/Dropout MLP head.
    Trained with the log-cosh loss (zdcsim.ops.losses.log_cosh_loss).
    """

    output_dim: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]
        x = nn.Conv(32, (5, 5), strides=(2, 2), padding=((1, 1), (1, 1)))(x)  # 27x14
        x = GroupNorm2d(32, groups=8)(x)
        x = nn.relu(x)
        x = max_pool(x, (2, 2), (1, 1))  # 26x13

        x = ResidualBlock(32, kernel_size=5, strides=2)(x)  # 13x7
        x = max_pool(x, (2, 2), (1, 1))  # 12x6

        x = ResidualBlock(64, kernel_size=5, strides=2)(x)  # 6x3
        x = max_pool(x, (2, 2), (1, 1))  # 5x2

        features = jnp.mean(x, axis=(1, 2))  # [B, 64]

        y = nn.Dense(128)(features)
        y = nn.LayerNorm()(y)
        y = leaky_relu(y)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        y = nn.Dense(64)(y)
        y = nn.LayerNorm()(y)
        y = leaky_relu(y)
        y = nn.Dropout(0.3, deterministic=not train)(y)
        return nn.Dense(self.output_dim)(y)
