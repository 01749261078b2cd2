"""Model registry and expert stacking.

Mirrors the reference's string registry (expertsim/models/__init__.py:11-28)
minus its import-time bugs: the reference maps two names to classes that do
not exist (``GeneratorUnified``, ``AttentionRouterNetwork``); here every
registered name resolves, and the attention router is implemented as the
intended capability.

Expert stacking is the central TPU-native divergence: instead of a Python
list of deep-copied modules (reference moe.py:29-35), ``stack_experts``
applies ``nn.vmap`` over a leading expert axis — per-expert parameters are
one stacked pytree, every sample runs through every expert in one XLA
program, and losses are masked by the routing gates (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple, Type

import flax.linen as nn

from zdcsim.models.neutron import (  # noqa: F401
    NEUTRON_SHAPE,
    AuxRegNeutron,
    DiscriminatorNeutron,
    GeneratorNeutron,
    GeneratorNeutronV2,
)
from zdcsim.models.proton import PROTON_SHAPE, AuxReg, Discriminator, Generator  # noqa: F401
from zdcsim.models.router import AttentionRouterNetwork, RouterNetwork  # noqa: F401

MODEL_REGISTRY: Dict[str, Type[nn.Module]] = {
    "proton.generator": Generator,
    "proton.discriminator": Discriminator,
    "proton.aux_reg": AuxReg,
    "neutron.generator": GeneratorNeutron,
    "neutron.generator_v2": GeneratorNeutronV2,
    "neutron.discriminator": DiscriminatorNeutron,
    "neutron.aux_reg": AuxRegNeutron,
    "router_v1": RouterNetwork,
    "router_attention": AttentionRouterNetwork,
}


def build_model(name: str, model_specs: Dict[str, Any] | None = None) -> nn.Module:
    """Instantiate a registered module from keyword specs (reference
    ``build_model``, models/__init__.py:25-28 — no device argument: placement
    is a sharding concern in JAX, not a model concern)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model '{name}'. Available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**(model_specs or {}))


def stack_experts(
    module_cls: Type[nn.Module], n_experts: int, in_axes=None, **module_kwargs
) -> nn.Module:
    """Stack ``n_experts`` independent copies of a module on a leading axis.

    Parameters (and batch_stats: BN running stats, spectral-norm u/v) get a
    leading ``[E, ...]`` axis; by default inputs are broadcast to all experts
    (``in_axes=None``); pass e.g. ``in_axes=(0, None)`` to feed each expert
    its own leading-axis slice of the first argument. Outputs gain a leading
    ``[E, ...]`` axis. ``split_rngs`` gives each expert an independent init
    (the reference's deepcopy-per-expert equivalent, moe.py:29-35, including
    its non-sharing assertion at :44-48 — vmapped params are distinct by
    construction). Different ``in_axes`` stackings of the same module class
    share an identical parameter pytree, so one state serves both.
    """
    stacked = nn.vmap(
        module_cls,
        in_axes=in_axes,
        out_axes=0,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        axis_size=n_experts,
    )
    return stacked(**module_kwargs)


@dataclass
class MoEModules:
    """The four Flax modules of one MoE system plus its geometry.

    ``generator_single`` is the unstacked generator class instance: its
    parameter tree matches one leading-axis slice of the stacked tree, which
    grouped inference dispatch uses to decode a bucket with a single
    expert's weights (zdcsim.inference.engine._build_grouped).

    ``generator_masked`` / ``aux_reg_masked`` (neutron ``norm=batch`` only)
    are re-stackings of the same module classes with an extra per-expert
    routing-mask input (in_axes covers it with 0) — identical parameter
    pytree, so the one train state serves both; the dense train step uses
    them to feed each expert's BatchNorm its routed sub-batch statistics
    (zdcsim.models.layers.MaskedBatchNorm).
    """

    generator: nn.Module
    discriminator: nn.Module
    aux_reg: nn.Module
    router: nn.Module
    n_experts: int
    noise_dim: int
    cond_dim: int
    image_shape: Tuple[int, int]
    names: Dict[str, str] = field(default_factory=dict)
    generator_single: nn.Module | None = None
    generator_masked: nn.Module | None = None
    aux_reg_masked: nn.Module | None = None
    discriminator_single: nn.Module | None = None
    aux_reg_single: nn.Module | None = None


def build_moe(cfg) -> MoEModules:
    """Build the expert-stacked G/D/Aux + router from a config tree
    (the analog of reference ``setup_moe_system``, train/loop.py:332-354)."""
    arch = cfg.model.architecture
    n_experts = int(cfg.model.n_experts)
    noise_dim = int(cfg.model.noise_dim)
    cond_dim = int(cfg.model.cond_dim)

    # model.generator.version: "v1" = reference-parity architecture; the
    # neutron family additionally registers "v2" (proton-recipe GN/LN
    # generator at 44x44 — the round-5 alternative-architecture arm).
    gen_version = str(cfg.model.generator.get("version", "v1"))
    gen_key = f"{arch}.generator" + ("" if gen_version == "v1" else f"_{gen_version}")
    if gen_key not in MODEL_REGISTRY:
        raise ValueError(
            f"no generator version {gen_version!r} for architecture "
            f"{arch!r}. Available: {sorted(MODEL_REGISTRY)}"
        )
    gen_cls = MODEL_REGISTRY[gen_key]
    disc_cls = MODEL_REGISTRY[f"{arch}.discriminator"]
    aux_cls = MODEL_REGISTRY[f"{arch}.aux_reg"]
    router_cls = MODEL_REGISTRY[cfg.model.router.version]

    # Neutron family: model.norm selects batch (reference parity) or group
    # normalization (batch-independent; exact per-expert semantics in the
    # dense train step — see GeneratorNeutron._bn).
    gen_extra, aux_extra = {}, {}
    if arch == "neutron":
        norm = str(cfg.model.get("norm", "batch"))
        gen_extra["norm"] = norm
        aux_extra["norm"] = norm
    # Width-scaled distilled serving students exist for both families
    # (proton.Generator / GeneratorNeutron share the width convention).
    width = float(cfg.model.generator.get("width", 1.0))
    if width != 1.0:
        gen_extra["width"] = width

    # NOTE: nn.vmap drops keyword args, so ``train`` MUST be passed
    # positionally through stacked modules; in_axes covers it with None.
    generator = stack_experts(
        gen_cls, n_experts, in_axes=(None, None, None),
        noise_dim=noise_dim, cond_dim=cond_dim, **gen_extra,
    )
    # Discriminator/aux consume per-expert fakes [E, B, ...]; the conditioning
    # (and real images, broadcast by the caller) are shared across experts.
    discriminator = stack_experts(disc_cls, n_experts, in_axes=(0, None, None), cond_dim=cond_dim)
    aux_reg = stack_experts(aux_cls, n_experts, in_axes=(0, None), **aux_extra)
    router = router_cls(n_experts=n_experts)

    # Neutron reference-parity mode: re-stack G/aux with a per-expert routing
    # mask input so the dense train step can compute each expert's BatchNorm
    # statistics over its routed sub-batch (the reference's subset-forward
    # semantics, moe.py:121-207). Same parameter pytree as the mask-free
    # stackings above.
    generator_masked = aux_reg_masked = None
    if arch == "neutron" and gen_extra.get("norm", "batch") == "batch":
        generator_masked = stack_experts(
            gen_cls, n_experts, in_axes=(None, None, None, 0),
            noise_dim=noise_dim, cond_dim=cond_dim, **gen_extra,
        )
        aux_reg_masked = stack_experts(aux_cls, n_experts, in_axes=(0, None, 0), **aux_extra)

    return MoEModules(
        generator_masked=generator_masked,
        aux_reg_masked=aux_reg_masked,
        generator=generator,
        discriminator=discriminator,
        aux_reg=aux_reg,
        router=router,
        generator_single=gen_cls(noise_dim=noise_dim, cond_dim=cond_dim, **gen_extra),
        discriminator_single=disc_cls(cond_dim=cond_dim),
        aux_reg_single=aux_cls(**aux_extra),
        n_experts=n_experts,
        noise_dim=noise_dim,
        cond_dim=cond_dim,
        image_shape=tuple(cfg.dataset.input_image_shape),
        names={
            "generator": gen_cls.__name__,
            "discriminator": disc_cls.__name__,
            "aux_reg": aux_cls.__name__,
            "router": router_cls.__name__,
        },
    )


def count_parameters(params) -> int:
    """Total parameter count of a pytree (reference ``count_model_parameters``,
    train/training_setup.py:7-10)."""
    import jax

    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def model_info(modules: MoEModules, state) -> str:
    """Human-readable component/parameter summary (reference
    ``print_model_info``, training_setup.py:44-67). Stacked components report
    E x per-expert counts."""
    e = modules.n_experts
    lines = [f"MoE system: {e} expert(s), noise_dim={modules.noise_dim}, "
             f"cond_dim={modules.cond_dim}, image={modules.image_shape}"]
    for name, comp in (("generator", state.gen), ("discriminator", state.disc),
                       ("aux_reg", state.aux)):
        total = count_parameters(comp.params)
        lines.append(
            f"  {name:14s} {modules.names.get(name, '?'):28s} "
            f"{total:>12,d} params ({total // e:,d}/expert)"
        )
    r = count_parameters(state.router.params)
    lines.append(f"  {'router':14s} {modules.names.get('router', '?'):28s} {r:>12,d} params")
    return "\n".join(lines)
