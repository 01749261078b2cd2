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


def _nearest_matrix(n_out: int, n_in: int) -> "np.ndarray":
    """[n_out, n_in] 0/1 selection matrix of the nearest-neighbour index map
    ``floor((i + 0.5) * n_in / n_out)`` — the same convention as
    ``jax.image.resize(method='nearest')`` and the int8 serving gather
    (proton_fast.resize_conv4_int8_naive)."""
    import numpy as np

    idx = np.floor((np.arange(n_out) + 0.5) * n_in / n_out).astype(int)
    return (idx[:, None] == np.arange(n_in)[None, :]).astype(np.float32)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize of an NHWC tensor to an exact (H, W).

    Float inputs go through two one-hot MATMULS instead of
    ``jax.image.resize``: a gather-style resize lowers its backward (and at
    some shapes the forward) into per-column XLA while loops — the round-4
    dense-train-step profile measured the 35x19->56x30 resize family at
    ~10% of the whole step (BENCH_LOG "Round-4 train-step budget"). One-hot
    matmuls run forward AND backward on the MXU as plain GEMMs, and are
    bit-exact: every output element is ``1.0 * x[src]`` plus true zeros,
    exact in any float dtype (verified vs jax.image.resize in
    tests/test_models.py::test_resize_nearest_matmul_exact).
    Integer dtypes (the int8 serving path materializes its own gather) and
    pure-downscale shapes keep ``jax.image.resize``.
    """
    b, h, w, c = x.shape
    H, W = size
    if (H, W) == (h, w):
        return x
    if H % h == 0 and W % w == 0:
        return upsample_nearest(x, (H // h, W // w))
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jax.image.resize(x, (b, H, W, c), method="nearest")
    rows = jnp.asarray(_nearest_matrix(H, h), x.dtype)  # [H, h]
    cols = jnp.asarray(_nearest_matrix(W, w), x.dtype)  # [W, w]
    x = jnp.einsum("Oh,bhwc->bOwc", rows, x)
    return jnp.einsum("Pw,bOwc->bOPc", cols, x)


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


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose training statistics come from a per-sample mask.

    The reference trains each neutron expert on its ROUTED SUB-BATCH, so its
    BatchNorm layers see sub-batch statistics
    (expertsim/models/moe.py:121-207 subset forwards through the BN generator,
    models/neutron/generator.py:5-49). zdcsim's dense all-expert train step
    runs every sample through every expert; with a plain BatchNorm that means
    full-batch statistics — a measured GAN destabilizer (BENCH_LOG round-2
    GroupNorm-vs-BN A/B). This layer restores reference semantics inside the
    dense step: given the expert's routing mask ``m`` in {0,1}^B, the batch
    mean/var are the mask-weighted statistics

        mean = sum(m*x) / sum(m),  var = sum(m*(x-mean)^2) / sum(m)

    which equal the subset statistics exactly, so masked rows of the output
    match a per-subset BatchNorm forward bit-for-bit (up to fp reduction
    order; tested in tests/test_models.py). Unmasked rows are normalized with
    the same statistics — their values are discarded by the gate-masked
    losses. Running averages update from the masked statistics only.

    ``mask=None`` (or eval mode) degrades to standard BatchNorm behavior.
    Statistics are computed in float32 regardless of input dtype (bf16-safe;
    two-pass mean/var — no E[x^2]-E[x]^2 cancellation). Divergence from
    torch: running_var stores the biased variance (flax convention), torch
    stores unbiased; momentum 0.9 matches torch's default 0.1 complement.
    Cross-device sync: set ``axis_name`` to psum the weighted sums over a
    data-parallel mesh axis.

    UNROUTED rows are ZEROED in the output (train mode with a mask). They
    are semantically dead — every loss, statistic, and photon sum is masked
    — but if left normalized by another sub-batch's statistics their
    magnitudes compound across stacked BN layers until they overflow, and
    ``inf * 0`` in the downstream masked reductions poisons the whole step
    with NaNs (observed: round-3 neutron masked-BN run NaN'd at epoch ~6
    exactly this way). Zeroing keeps every dead row bounded; routed rows
    are untouched, so the subset-forward equivalence above is unchanged.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = True):
        feature_shape = (x.shape[-1],)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(feature_shape, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(feature_shape, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, feature_shape)
        bias = self.param("bias", nn.initializers.zeros, feature_shape)

        if train:
            xf = x.astype(jnp.float32)
            red_axes = tuple(range(x.ndim - 1))
            # elements per feature channel contributed by masked samples
            spatial = 1.0
            for d in x.shape[1:-1]:
                spatial *= d
            if mask is None:
                w_sum = jnp.asarray(float(x.shape[0]), jnp.float32)
                s1 = jnp.sum(xf, axis=red_axes)
            else:
                m = mask.astype(jnp.float32).reshape((x.shape[0],) + (1,) * (x.ndim - 1))
                w_sum = jnp.sum(m)
                s1 = jnp.sum(xf * m, axis=red_axes)
            cnt = w_sum * spatial
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            centered = xf - mean
            if mask is None:
                s2 = jnp.sum(centered * centered, axis=red_axes)
            else:
                s2 = jnp.sum(centered * centered * m, axis=red_axes)
            if self.axis_name is not None:
                s2 = jax.lax.psum(s2, self.axis_name)
            var = s2 / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
            centered = x.astype(jnp.float32) - mean

        y = centered * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if train and mask is not None:
            y = y * mask.astype(jnp.float32).reshape(
                (x.shape[0],) + (1,) * (x.ndim - 1)
            )
        return y.astype(x.dtype)


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
