"""Shared building blocks for zdcsim Flax models.

All image tensors use NHWC layout (TPU-native for XLA convolutions); the
reference's NCHW shapes in docstrings are translated accordingly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)


def upsample_nearest(x: jnp.ndarray, scale: Tuple[int, int] = (2, 2)) -> jnp.ndarray:
    """Nearest-neighbour upsampling for NHWC tensors by integer factors.

    Implemented with reshape+broadcast (exact for integer factors and cheaper
    to lower than a general resize).
    """
    b, h, w, c = x.shape
    sh, sw = scale
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, sh, w, sw, c))
    return x.reshape(b, h * sh, w * sw, c)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor to an exact (H, W)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="nearest")


def max_pool(x: jnp.ndarray, window: Tuple[int, int], strides: Tuple[int, int] | None = None) -> jnp.ndarray:
    strides = strides or window
    return nn.max_pool(x, window_shape=window, strides=strides, padding="VALID")


def group_norm_groups(channels: int, groups: int = 32) -> int:
    """Largest group count <= ``groups`` dividing ``channels`` (reference
    ``Norm2d``, proton/aux_reg.py:49-54)."""
    g = min(groups, channels)
    while channels % g != 0 and g > 1:
        g -= 1
    return g


class GroupNorm2d(nn.Module):
    """GroupNorm with the reference's divisor-adjusted group count."""

    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(num_groups=group_norm_groups(self.channels, self.groups))(x)


class SNDense(nn.Module):
    """Spectrally-normalized Dense (power-iteration state in batch_stats)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return nn.SpectralNorm(nn.Dense(self.features, use_bias=self.use_bias))(
            x, update_stats=train
        )


class SNConv(nn.Module):
    """Spectrally-normalized Conv (VALID padding unless specified)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str | Sequence[Tuple[int, int]] = "VALID"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        conv = nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
        )
        return nn.SpectralNorm(conv)(x, update_stats=train)


class ExpertDense(nn.Module):
    """All-experts batched linear: ``[E, B, I] x [E, I, O] -> [E, B, O]``.

    The explicit einsum counterpart of the reference's dormant
    ``GroupedLinear`` (expertsim/models/proton/discriminator.py:8-45, its
    abandoned attempt at vectorizing experts). zdcsim's primary expert
    vectorization is ``stack_experts`` (nn.vmap); this layer exists for
    architectures that want a grouped projection *inside* a single module —
    the einsum lowers to one batched MXU matmul.
    """

    n_experts: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.n_experts, in_features, self.features),
        )
        y = jnp.einsum("ebi,eio->ebo", x, kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.n_experts, 1, self.features))
            y = y + bias
        return y


class MLPBlock(nn.Module):
    """Dense + LayerNorm + LeakyReLU(0.1) used across the reference heads."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.features)(x)
        x = nn.LayerNorm()(x)
        return leaky_relu(x)
