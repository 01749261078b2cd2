"""Train state pytrees and expert-masked optimizer updates.

The reference keeps 3*E+1 separate Adam optimizers in Python lists
(expertsim/train/training_setup.py:12-41) and skips an expert's
``optimizer.step()`` whenever its routed sub-batch has <= 1 sample
(moe.py:132-135). Here each component's per-expert parameters live on a
leading ``[E, ...]`` axis of ONE pytree (one Adam state each), and the skip
becomes :func:`masked_expert_update` — inactive experts keep their previous
parameters and Adam moments inside one jitted program. Known divergence: the
Adam step COUNT is a single scalar shared across experts (optax state
layout), so an expert frozen for many steps sees a more-converged bias
correction on reactivation than the reference's per-expert optimizers would
(effect bounded: correction factors differ only while moments are near zero).

EMA of generator weights is implemented live (the reference instantiates an
``EMAHelper`` but never calls ``update()`` — train/loop.py:44,380-418; a
known defect SURVEY.md §2.4 says not to replicate).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class Component:
    """One model component: parameters, non-param state, optimizer state."""

    params: Any
    stats: Any  # {'batch_stats': ...} collections (SN power-iteration u, BN stats)
    opt_state: Any


@flax.struct.dataclass
class MoETrainState:
    gen: Component
    disc: Component
    aux: Component
    router: Component
    ema_gen_params: Any  # shadow generator weights, decay cfg (default 0.99)
    step: jnp.ndarray  # global step counter


def _split_collections(variables: Dict[str, Any]) -> Tuple[Any, Dict[str, Any]]:
    params = variables.get("params", {})
    stats = {k: v for k, v in variables.items() if k != "params"}
    return params, stats


def make_optimizers(cfg) -> Dict[str, optax.GradientTransformation]:
    """Adam per component with the reference learning rates
    (default.yaml: lr_g=1e-4, lr_d=1e-5, lr_a=1e-4, lr_r=1e-4; torch Adam
    defaults beta=(0.9, 0.999), eps=1e-8)."""
    adam = lambda lr: optax.adam(float(lr), b1=0.9, b2=0.999, eps=1e-8)
    return {
        "gen": adam(cfg.model.generator.lr_g),
        "disc": adam(cfg.model.discriminator.lr_d),
        "aux": adam(cfg.model.aux_reg.lr_a),
        "router": adam(cfg.model.router.lr_r),
    }


def init_state_jit(modules, cfg, key: jax.Array, batch_size: int = 2) -> MoETrainState:
    """Jitted init: ONE compiled program instead of hundreds of op-by-op
    dispatches — essential on remote-relay backends where each dispatch pays
    a round trip (observed: minutes of init on the tunneled TPU)."""
    return jax.jit(lambda k: init_state(modules, cfg, k, batch_size))(key)


def init_state(modules, cfg, key: jax.Array, batch_size: int = 2) -> MoETrainState:
    """Initialize all four components and their optimizers."""
    h, w = modules.image_shape
    kg, kd, ka, kr, kdrop = jax.random.split(key, 5)
    noise = jnp.zeros((batch_size, modules.noise_dim), jnp.float32)
    cond = jnp.zeros((batch_size, modules.cond_dim), jnp.float32)
    img_e = jnp.zeros((modules.n_experts, batch_size, h, w, 1), jnp.float32)
    img_b = jnp.zeros((batch_size, h, w, 1), jnp.float32)

    txs = make_optimizers(cfg)

    gen_vars = modules.generator.init({"params": kg, "dropout": kdrop}, noise, cond, False)
    gen_params, gen_stats = _split_collections(gen_vars)

    disc_vars = modules.discriminator.init({"params": kd}, img_e, cond, False)
    disc_params, disc_stats = _split_collections(disc_vars)

    aux_vars = modules.aux_reg.init({"params": ka, "dropout": kdrop}, img_e, False)
    aux_params, aux_stats = _split_collections(aux_vars)

    router_vars = modules.router.init({"params": kr}, cond)
    router_params, router_stats = _split_collections(router_vars)

    comp = lambda name, params, stats: Component(
        params=params, stats=stats, opt_state=txs[name].init(params)
    )
    return MoETrainState(
        gen=comp("gen", gen_params, gen_stats),
        disc=comp("disc", disc_params, disc_stats),
        aux=comp("aux", aux_params, aux_stats),
        router=comp("router", router_params, router_stats),
        # Fresh buffers (not aliases of gen.params) — the jitted step donates
        # the whole state, and XLA rejects donating one buffer twice.
        ema_gen_params=jax.tree_util.tree_map(jnp.copy, gen_params),
        step=jnp.zeros((), jnp.int32),
    )


def _where_expert(active: jnp.ndarray, new: Any, old: Any) -> Any:
    """Per-leaf select: keep ``old`` for experts where ``active`` is False.

    Every leaf of an expert-stacked pytree has leading dim E (nn.vmap
    ``variable_axes={'params': 0}``); scalar leaves (e.g. Adam step counts)
    are shared bookkeeping and always advance.
    """
    e = active.shape[0]

    def sel(n, o):
        n = jnp.asarray(n)
        if n.ndim >= 1 and n.shape[0] == e:
            m = active.reshape((e,) + (1,) * (n.ndim - 1))
            return jnp.where(m, n, o)
        return n

    return jax.tree_util.tree_map(sel, new, old)


def masked_expert_update(
    tx: optax.GradientTransformation,
    comp: Component,
    grads: Any,
    active: jnp.ndarray,
    new_stats: Any = None,
) -> Component:
    """Adam update applied only to active experts.

    ``active`` is a ``[E]`` bool vector; inactive experts retain parameters,
    optimizer moments, and batch stats (the reference's skipped
    ``optimizer.step()``, moe.py:132-135). ``new_stats`` optionally replaces
    the collections (masked the same way).
    """
    updates, opt_state_new = tx.update(grads, comp.opt_state, comp.params)
    params_new = optax.apply_updates(comp.params, updates)
    params_new = _where_expert(active, params_new, comp.params)
    opt_state_new = _where_expert(active, opt_state_new, comp.opt_state)
    stats = comp.stats
    if new_stats is not None:
        stats = _where_expert(active, new_stats, comp.stats)
    return Component(params=params_new, stats=stats, opt_state=opt_state_new)


def gated_update(
    tx: optax.GradientTransformation, comp: Component, grads: Any, enabled: jnp.ndarray
) -> Component:
    """Optimizer update gated by a scalar bool (the router's
    ``stop_router_training_epoch`` schedule, moe.py:436-442)."""
    updates, opt_state_new = tx.update(grads, comp.opt_state, comp.params)
    params_new = optax.apply_updates(comp.params, updates)
    pick = lambda n, o: jnp.where(enabled, n, o)
    return Component(
        params=jax.tree_util.tree_map(pick, params_new, comp.params),
        stats=comp.stats,
        opt_state=jax.tree_util.tree_map(pick, opt_state_new, comp.opt_state),
    )


def ema_update(ema_params: Any, new_params: Any, decay: float) -> Any:
    """Shadow-weight EMA: ``ema = decay*ema + (1-decay)*new`` (the intent of
    the reference's dormant EMAHelper, train/loop.py:380-418)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
