"""Neutron ZDC (ZN, 44x44) model family.

Flax re-designs of the reference architectures (cited per class). The
reference uses BatchNorm here; batch statistics live in ``batch_stats`` and
can be synchronized across a data-parallel mesh via ``axis_name``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from zdcsim.models.layers import (
    GroupNorm2d,
    MLPBlock,
    MaskedBatchNorm,
    SNConv,
    SNDense,
    leaky_relu,
    max_pool,
    resize_nearest,
    upsample_nearest,
)

NEUTRON_SHAPE = (44, 44)


class GeneratorNeutron(nn.Module):
    """DCGAN-style conditional generator for 44x44 neutron showers.

    Reference: "Generator-neutron-1-original-architecture"
    (expertsim/models/neutron/generator.py:5-49): FC256(BN, Drop .2, LReLU)
    -> FC 128*13*13(BN, Drop, LReLU) -> reshape 13x13x128 -> up x2 ->
    Conv3x3 256(BN, Drop, LReLU) -> up x2 -> Conv3x3 128(BN, Drop, LReLU)
    -> Conv2x2 64(BN, Drop, LReLU) -> Conv2x2 1 -> ReLU => 44x44 log-space.
    """

    noise_dim: int = 10
    cond_dim: int = 9
    bn_axis_name: Optional[str] = None  # set to the mesh data axis for synced BN
    norm: str = "batch"  # "batch" (reference parity), "group", or "none" (see _bn)
    width: float = 1.0  # channel-width multiplier for distilled serving students

    def _w(self, c: int) -> int:
        # Same convention as the proton student family (proton.py): every
        # channel count scales by ``width``, rounded down to a multiple of 32
        # (min 32) so MXU lanes stay full. width=1 is the reference
        # architecture bit-for-bit.
        return max(32, int(c * self.width) // 32 * 32)

    def _bn(self, x, train, mask=None):
        # model.norm=group swaps BatchNorm for batch-independent GroupNorm /
        # LayerNorm — no batch statistics, so the dense all-expert step is
        # exactly per-expert faithful, deterministic, sync-free.
        # model.norm=batch keeps the reference's BatchNorm layers; during
        # dense training the expert's routing mask is threaded in so the
        # statistics come from the routed sub-batch, reproducing the
        # reference's subset-forward semantics (see MaskedBatchNorm).
        # model.norm=none drops normalization entirely — the distilled
        # serving-student preset: the parameter tree is then exactly the
        # BN-folded serving layout, so zdcsim.models.neutron_fast serves it
        # directly (distillation is plain regression and needs no norms).
        if self.norm == "none":
            return x
        if self.norm == "group":
            if x.ndim == 4:
                return GroupNorm2d(x.shape[-1])(x)
            return nn.LayerNorm()(x)
        return MaskedBatchNorm(momentum=0.9, axis_name=self.bn_axis_name)(
            x, mask, train
        )

    @nn.compact
    def __call__(
        self,
        noise: jnp.ndarray,
        cond: jnp.ndarray,
        train: bool = True,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        x = jnp.concatenate([noise, cond], axis=1)
        x = nn.Dense(256)(x)
        x = self._bn(x, train, mask)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = leaky_relu(x)

        x = nn.Dense(self._w(128) * 13 * 13)(x)
        x = self._bn(x, train, mask)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = leaky_relu(x)

        x = x.reshape(-1, 13, 13, self._w(128))
        x = upsample_nearest(x)  # 26x26

        x = nn.Conv(self._w(256), (3, 3), padding="VALID")(x)  # 24x24
        x = self._bn(x, train, mask)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = leaky_relu(x)

        x = upsample_nearest(x)  # 48x48
        x = nn.Conv(self._w(128), (3, 3), padding="VALID")(x)  # 46x46
        x = self._bn(x, train, mask)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = leaky_relu(x)

        x = nn.Conv(self._w(64), (2, 2), padding="VALID")(x)  # 45x45
        x = self._bn(x, train, mask)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = leaky_relu(x)

        x = nn.Conv(1, (2, 2), padding="VALID")(x)  # 44x44
        return nn.relu(x)


class GeneratorNeutronV2(nn.Module):
    """Proton-recipe conditional generator re-dimensioned for 44x44 showers.

    NOT a reference architecture: the reference's neutron generator is the
    DCGAN+BN family (expertsim/models/neutron/generator.py:5-49 —
    ``GeneratorNeutron`` here). This variant transplants the proton
    generator's LayerNorm-MLP + GroupNorm-conv recipe
    ("Generator-v5-bigkernel", expertsim/models/proton/generator.py:5-53 /
    zdcsim.models.proton.Generator) onto the neutron geometry, as the
    alternative-architecture arm of the neutron fidelity study (round-5):
    concat(noise, cond) -> FC256(LN) -> FC 512*12*12(LN) -> reshape
    12x12x512 -> up x2 -> Conv4x4 256 (GN) 23x23 -> resize to 44x44 ->
    Conv4x4 128 (GN) 43x43 -> Conv3x3 64 (GN) 43x43 -> Conv2x2 1 (pad 1)
    -> ReLU => 44x44 log-space.

    Select with ``model.generator.version=v2`` under
    ``model.architecture=neutron``. Normalization is batch-independent
    (GroupNorm/LayerNorm — ``norm`` accepts "group" or "none" for
    distilled students; the BatchNorm mode is the v1 module's domain).
    """

    noise_dim: int = 10
    cond_dim: int = 9
    norm: str = "group"
    width: float = 1.0

    @nn.compact
    def __call__(
        self,
        noise: jnp.ndarray,
        cond: jnp.ndarray,
        train: bool = True,
        mask: Optional[jnp.ndarray] = None,  # unused: batch-independent norms
    ) -> jnp.ndarray:
        if self.norm not in ("group", "none"):
            raise ValueError(
                "GeneratorNeutronV2 supports norm='group'|'none' "
                f"(got {self.norm!r}); norm='batch' is GeneratorNeutron"
            )
        w = lambda c: max(32, int(c * self.width) // 32 * 32)
        gn = (
            (lambda x: GroupNorm2d(x.shape[-1])(x))
            if self.norm == "group" else (lambda x: x)
        )
        x = jnp.concatenate([noise, cond], axis=1)
        x = MLPBlock(256)(x)
        x = MLPBlock(w(512) * 12 * 12)(x)
        x = x.reshape(-1, 12, 12, w(512))

        x = upsample_nearest(x)  # 24x24
        x = nn.Conv(w(256), (4, 4), padding=((1, 1), (1, 1)))(x)  # 23x23
        x = gn(x)
        x = leaky_relu(x)

        x = resize_nearest(x, NEUTRON_SHAPE)
        x = nn.Conv(w(128), (4, 4), padding=((1, 1), (1, 1)))(x)  # 43x43
        x = gn(x)
        x = leaky_relu(x)

        x = nn.Conv(w(64), (3, 3), padding=((1, 1), (1, 1)))(x)  # 43x43
        x = gn(x)
        x = leaky_relu(x)

        x = nn.Conv(1, (2, 2), padding=((1, 1), (1, 1)))(x)  # 44x44
        return nn.relu(x)


class DiscriminatorNeutron(nn.Module):
    """Hinge discriminator with spectral norm for 44x44 showers.

    Reference: "Discriminator-neutron-1-expert-hinge-SN"
    (expertsim/models/neutron/discriminator.py:6-48): SN Conv3x3 32 (GN8) ->
    pool 2x2 -> SN Conv3x3 16 (GN8) -> pool 2x2 -> flatten ++ cond -> SN
    FC128(LN) -> SN FC64(LN) = latent -> SN FC1. For 44x44 input the flat
    size is 16*9*9 = 1296, matching the reference's hardcoded 9*12*12.
    """

    cond_dim: int = 9

    @nn.compact
    def __call__(self, img: jnp.ndarray, cond: jnp.ndarray, train: bool = True):
        x = SNConv(32, (3, 3))(img, train=train)  # 42x42
        x = GroupNorm2d(32, groups=8)(x)
        x = leaky_relu(x)
        x = max_pool(x, (2, 2))  # 21x21

        x = SNConv(16, (3, 3))(x, train=train)  # 19x19
        x = GroupNorm2d(16, groups=8)(x)
        x = leaky_relu(x)
        x = max_pool(x, (2, 2))  # 9x9

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


class AuxRegNeutron(nn.Module):
    """Auxiliary coordinate regressor for neutron showers.

    Reference: (expertsim/models/neutron/aux_reg.py:8-81): four Conv3x3
    stages 32->64->128->256 with BN/Dropout and interleaved pools, a 1x1
    channel reduction to 64, adaptive global average pooling, and a single
    Linear(64, 2) head. Same log-cosh loss as the proton regressor.
    """

    output_dim: int = 2
    bn_axis_name: Optional[str] = None
    norm: str = "batch"  # "batch" / "group" / "none" (see GeneratorNeutron._bn)

    def _bn(self, x, train, mask=None):
        if self.norm == "none":
            return x
        if self.norm == "group":
            if x.ndim == 4:
                return GroupNorm2d(x.shape[-1])(x)
            return nn.LayerNorm()(x)
        return MaskedBatchNorm(momentum=0.9, axis_name=self.bn_axis_name)(
            x, mask, train
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if x.ndim == 3:
            x = x[..., None]

        def stage(x, feats, pool_window):
            x = nn.Conv(feats, (3, 3), padding="VALID")(x)
            x = self._bn(x, train, mask)
            x = leaky_relu(x)
            x = nn.Dropout(0.2, deterministic=not train)(x)
            if pool_window is not None:
                x = max_pool(x, pool_window)
            return x

        x = stage(x, 32, (2, 2))
        x = stage(x, 64, (2, 1))
        x = stage(x, 128, (2, 1))
        x = stage(x, 256, None)

        x = nn.Conv(64, (1, 1), use_bias=False)(x)
        x = self._bn(x, train, mask)
        x = leaky_relu(x)

        features = jnp.mean(x, axis=(1, 2))  # adaptive GAP -> [B, 64]
        return nn.Dense(self.output_dim)(features)
