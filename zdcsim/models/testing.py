"""Tiny stand-in modules for fast tests of the training machinery.

The real proton/neutron CNNs cost ~1.5 TFLOP per train step — minutes on a
1-core CPU test box. These MLP stand-ins expose the exact same interfaces
(generator(noise, cond, train) -> [B,H,W,1]; discriminator(img, cond, train)
-> (score, latent); aux(img, train) -> [B,2]) so the jitted step, masking,
optimizer gating, EMA, checkpointing, and sharding logic are all exercised at
negligible FLOPs. Production code never uses these.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from zdcsim.models import MoEModules, stack_experts
from zdcsim.models.router import RouterNetwork


class TinyGenerator(nn.Module):
    noise_dim: int = 10
    cond_dim: int = 9
    image_shape: Tuple[int, int] = (8, 6)

    @nn.compact
    def __call__(self, noise, cond, train: bool = True):
        h, w = self.image_shape
        x = jnp.concatenate([noise, cond], axis=1)
        x = nn.relu(nn.Dense(32)(x))
        x = nn.Dense(h * w)(x)
        return nn.relu(x).reshape(-1, h, w, 1)


class TinyDiscriminator(nn.Module):
    cond_dim: int = 9

    @nn.compact
    def __call__(self, img, cond, train: bool = True):
        x = img.reshape(img.shape[0], -1)
        x = jnp.concatenate([x, cond], axis=1)
        x = nn.relu(nn.Dense(32)(x))
        latent = nn.relu(nn.Dense(16)(x))
        return nn.Dense(1)(latent), latent


class TinyAuxReg(nn.Module):
    output_dim: int = 2

    @nn.compact
    def __call__(self, img, train: bool = True):
        x = img.reshape(img.shape[0], -1)
        x = nn.relu(nn.Dense(16)(x))
        return nn.Dense(self.output_dim)(x)


def build_tiny_moe(cfg, image_shape: Tuple[int, int] = (8, 6)) -> MoEModules:
    """A MoEModules bundle with tiny models, honoring cfg.model.{n_experts,
    noise_dim, cond_dim} and the requested image geometry."""
    n_experts = int(cfg.model.n_experts)
    noise_dim = int(cfg.model.noise_dim)
    cond_dim = int(cfg.model.cond_dim)
    generator = stack_experts(
        TinyGenerator, n_experts, in_axes=(None, None, None),
        noise_dim=noise_dim, cond_dim=cond_dim, image_shape=image_shape,
    )
    discriminator = stack_experts(
        TinyDiscriminator, n_experts, in_axes=(0, None, None), cond_dim=cond_dim
    )
    aux_reg = stack_experts(TinyAuxReg, n_experts, in_axes=(0, None))
    router = RouterNetwork(n_experts=n_experts)
    return MoEModules(
        generator=generator,
        discriminator=discriminator,
        aux_reg=aux_reg,
        router=router,
        generator_single=TinyGenerator(
            noise_dim=noise_dim, cond_dim=cond_dim, image_shape=image_shape
        ),
        discriminator_single=TinyDiscriminator(cond_dim=cond_dim),
        aux_reg_single=TinyAuxReg(),
        n_experts=n_experts,
        noise_dim=noise_dim,
        cond_dim=cond_dim,
        image_shape=image_shape,
        names={"generator": "TinyGenerator", "discriminator": "TinyDiscriminator",
               "aux_reg": "TinyAuxReg", "router": "RouterNetwork"},
    )
