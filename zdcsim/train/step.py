"""The jitted MoE-GAN train step.

TPU-native restructuring of the reference's ``MoEWrapper.train_step``
(expertsim/models/moe.py:52-504). The reference subsets the batch per expert
with boolean masks inside a Python loop and runs 2E+1 separate backward
passes; XLA cannot compile data-dependent shapes, so here **every sample runs
through every expert** (experts stacked on a leading axis via ``nn.vmap``)
and each expert's loss terms are masked means weighted by its batch share
``w_e = B_e/B`` — numerically identical to the reference's
subset-mean-times-``w`` scheme, in ONE fused XLA program with exact static
shapes.

Per batch, in reference order (moe.py:123-207):
1. router forward with gumbel-softmax at the epoch's temperature tau;
2. discriminator hinge update (generator frozen);
3. generator + aux-regressor update against the *updated* discriminator,
   with SDI-GAN diversity, intensity, and log-cosh aux terms;
4. router update from GAN/entropy/expert-distribution/differentiation/ALB
   terms, frozen after ``stop_router_training_epoch``.

Experts whose routed sub-batch has <= 1 sample are skipped exactly like the
reference (moe.py:132-135): their params/opt-state/stats are frozen via
:func:`zdcsim.train.state.masked_expert_update`.

Documented divergences from the reference:
- The reference appends *detached* generator losses to its router GAN term
  (moe.py:176-207 ``gen_losses.append(gen_loss.detach())``), so no gradient
  ever reaches the router from it. With
  ``router.differentiable_gan_term: true`` (zdcsim default) the GAN term is
  the straight-through-gate-weighted per-sample hinge score, which actually
  trains the router; ``false`` reproduces the reference's constant term.
- The reference multiplies ``diff_strength`` into its differentiation loss
  twice (moe.py:399+405); zdcsim applies it once.
- Spectral-norm power iteration advances once per forward like torch, but
  the exact iteration count per step differs by construction; both converge
  to the dominant singular vector.
- BatchNorm (neutron family only): ``model.norm: batch`` uses
  :class:`zdcsim.models.layers.MaskedBatchNorm` — each expert's BN
  statistics are mask-weighted over its ROUTED SUB-BATCH inside the dense
  forward, reproducing the reference's per-subset statistics exactly
  (masked rows match a per-subset BN forward; tested in
  tests/test_models.py). Remaining divergences: running_var stores biased
  variance (flax convention, torch stores unbiased) and the per-batch count
  of running-stat updates differs (documented in MaskedBatchNorm).
  ``model.norm: group`` swaps in batch-independent GroupNorm/LayerNorm
  (deterministic, sync-free — the measured-stable default preset).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from zdcsim.models import MoEModules
from zdcsim.ops.losses import (
    adaptive_load_balancing_loss,
    alb_annealing_weight,
    differentiation_loss,
    expert_distribution_loss,
    expert_utilization_entropy,
    hinge_discriminator_loss,
    hinge_generator_loss,
    intensity_regularization,
    log_cosh_loss,
    sdi_gan_regularization,
    tau_schedule,
)
from zdcsim.ops.routing import expert_masks
from zdcsim.train.state import (
    Component,
    MoETrainState,
    ema_update,
    gated_update,
    make_optimizers,
    masked_expert_update,
)

# ops losses vmapped over the leading expert axis; scalars/shared arrays
# broadcast (in_axes=None). Semantics stay bit-identical to the unit-tested
# single-expert functions.
_hinge_d_e = jax.vmap(hinge_discriminator_loss, in_axes=(0, 0, 0))
_hinge_g_e = jax.vmap(hinge_generator_loss, in_axes=(0, 0))
_sdi_e = jax.vmap(sdi_gan_regularization, in_axes=(0, 0, None, None, None, None, 0, None))
_intensity_e = jax.vmap(intensity_regularization, in_axes=(0, None, None, 0))
_log_cosh_e = jax.vmap(log_cosh_loss, in_axes=(None, 0, 0))

# Switch-dispatch variants: inputs are per-sample ROUTED arrays [B, ...]
# (each sample already decoded/scored by its own expert), vmapped over the
# expert MASKS only — the masked means select exactly the same terms the
# dense path's masked [E, B] rows contribute, so losses are equal up to fp
# reduction order (tested in tests/test_train_step.py).
_hinge_d_r = jax.vmap(hinge_discriminator_loss, in_axes=(None, None, 0))
_hinge_g_r = jax.vmap(hinge_generator_loss, in_axes=(None, 0))
_sdi_r = jax.vmap(sdi_gan_regularization, in_axes=(None, None, None, None, None, None, 0, None))
_intensity_r = jax.vmap(intensity_regularization, in_axes=(None, None, None, 0))
_log_cosh_r = jax.vmap(log_cosh_loss, in_axes=(None, None, 0))


def _apply(module, params, stats, *args, rngs=None, **kwargs):
    """Apply a module with mutable non-param collections; returns (out, stats)."""
    variables = {"params": params, **stats}
    mutable = list(stats.keys())
    if mutable:
        out, updates = module.apply(variables, *args, rngs=rngs, mutable=mutable, **kwargs)
        return out, updates
    return module.apply(variables, *args, rngs=rngs, **kwargs), stats


def build_train_step(modules: MoEModules, cfg, mesh=None, example_state=None):
    """Returns ``train_step(state, batch, key, epoch) -> (state, metrics)``,
    jitted with ``epoch`` traced (one compilation covers all epochs).

    With ``mesh`` (and an ``example_state`` for its pytree structure), the
    step compiles as one GSPMD program: batch sharded over the data axis,
    expert-stacked parameters sharded over the expert axis, gradient psums
    and expert collectives inserted by XLA (zdcsim.parallel).
    """
    E = modules.n_experts
    noise_dim = modules.noise_dim
    mc = cfg.model
    di_strength = float(mc.generator.di_strength)
    in_strength = float(mc.generator.in_strength)
    aux_strength = float(mc.aux_reg.strength)
    r = mc.router
    gan_strength = float(r.gan_strength)
    util_strength = float(r.util_strength)
    ed_strength = float(r.ed_strength)
    diff_strength = float(r.diff_strength)
    alb_strength = float(r.alb_strength)
    tau_start, tau_min, tau_decay = float(r.tau_start), float(r.tau_min), float(r.tau_decay)
    stop_epoch = r.get("stop_router_training_epoch")
    alpha = int(r.alpha)
    min_weight = float(r.min_weight)
    differentiable_gan = bool(r.get("differentiable_gan_term", True))
    # The reference's SDI term accidentally broadcasts [B,1]/[B] into [B,B]
    # (moe.py:583-586); zdcsim defaults to the intended per-sample pairing and
    # exposes the quirk for bit-parity studies (ops/losses.py docstring).
    sdi_quirk = bool(mc.generator.get("sdi_pairwise_quirk", False))
    ema_decay = float(cfg.train.get("ema_decay", 0.99))
    txs = make_optimizers(cfg)

    gen_mod, disc_mod, aux_mod, router_mod = (
        modules.generator, modules.discriminator, modules.aux_reg, modules.router,
    )
    # Optional FLOP-reduced proton generator forward in training
    # (zdcsim/models/proton_fast.py — mathematically identical, different fp
    # reduction order). Off by default for strict module-path parity.
    use_fast_gen = (
        bool(cfg.train.get("fast_generator", False))
        and modules.names.get("generator") == "Generator"
    )

    # Mixed precision: bf16 compute with f32 master params/optimizer.
    # Parameters are cast at use (grad-of-cast upcasts automatically); loss
    # reductions stay f32. Opt-in via train.precision: bf16.
    use_bf16 = str(cfg.train.get("precision", "f32")) == "bf16"

    def _c16(tree):
        if not use_bf16:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    # Neutron norm=batch: mask-aware re-stackings feed each expert's
    # BatchNorm its routed sub-batch statistics (reference subset-forward
    # semantics, moe.py:121-207; see MaskedBatchNorm). Same param pytree.
    gen_masked_mod = modules.generator_masked
    aux_masked_mod = modules.aux_reg_masked

    def gen_forward(params, stats, noise, cond, key, bn_mask):
        if use_fast_gen:
            from zdcsim.models.proton_fast import fast_generator_apply

            out = jax.vmap(fast_generator_apply, in_axes=(0, None, None))(
                _c16(params), _c16(noise), _c16(cond)
            )
            return out.astype(jnp.float32), stats
        if bn_mask is not None and gen_masked_mod is not None:
            out, new_stats = _apply(
                gen_masked_mod, _c16(params), stats, _c16(noise), _c16(cond), True,
                bn_mask, rngs={"dropout": key},
            )
        else:
            out, new_stats = _apply(
                gen_mod, _c16(params), stats, _c16(noise), _c16(cond), True,
                rngs={"dropout": key},
            )
        return out.astype(jnp.float32), new_stats

    def disc_forward(params, stats, img, cond):
        (score, latent), new_stats = _apply(
            disc_mod, _c16(params), stats, _c16(img), _c16(cond), True
        )
        return (score.astype(jnp.float32), latent.astype(jnp.float32)), new_stats

    def aux_forward(params, stats, img, key, bn_mask):
        if bn_mask is not None and aux_masked_mod is not None:
            out, new_stats = _apply(
                aux_masked_mod, _c16(params), stats, _c16(img), True, bn_mask,
                rngs={"dropout": key},
            )
        else:
            out, new_stats = _apply(
                aux_mod, _c16(params), stats, _c16(img), True, rngs={"dropout": key}
            )
        return out.astype(jnp.float32), new_stats

    # Rematerialization: recompute the big G/D forwards in the backward pass
    # instead of keeping activations live. Dense-train activations scale with
    # E x B (E=5/B=512 OOMs a 16 GB chip without this). Opt-in: train.remat.
    if bool(cfg.train.get("remat", False)):
        gen_forward = jax.checkpoint(gen_forward)
        disc_forward = jax.checkpoint(disc_forward)
        aux_forward = jax.checkpoint(aux_forward)

    def train_step(
        state: MoETrainState, batch: Dict[str, jnp.ndarray], key: jax.Array, epoch: jnp.ndarray
    ) -> Tuple[MoETrainState, Dict[str, jnp.ndarray]]:
        real = batch["real"]  # [B, H, W, 1]
        cond = batch["cond"]  # [B, C]
        std = batch["std"]  # [B, 1]
        intensity = batch["intensity"]  # [B, 1]
        positions = batch["positions"]  # [B, 2]
        B = real.shape[0]

        k_gumbel, k_n1, k_n2, k_g1, k_g2, k_aux = jax.random.split(key, 6)
        epoch_f = jnp.asarray(epoch, jnp.float32)
        tau = tau_schedule(epoch_f, tau_start, tau_min, tau_decay)

        # ------ routing (moe.py:74-103) ------
        _, logits = router_mod.apply({"params": state.router.params}, cond)
        gumbel_noise = jax.random.gumbel(k_gumbel, logits.shape, logits.dtype)
        gates_soft = jax.nn.softmax((logits + gumbel_noise) / tau, axis=-1)
        idx = jnp.argmax(gates_soft, axis=-1)  # [B]
        masks = expert_masks(idx, E)  # [E, B]
        counts = jnp.sum(masks, axis=1)  # [E]
        w = counts / B  # class share, moe.py:105-106
        active = counts > 1.0  # B_e <= 1 experts skip training, moe.py:132
        active_f = active.astype(jnp.float32)

        noise_1 = jax.random.normal(k_n1, (B, noise_dim))
        noise_2 = jax.random.normal(k_n2, (B, noise_dim))
        real_e = jnp.broadcast_to(real[None], (E,) + real.shape)
        # Per-expert routing masks for BatchNorm statistics (neutron
        # norm=batch only; None elsewhere — see gen_forward).
        bn_mask = masks if (gen_masked_mod is not None) else None

        # ------ discriminator update (moe.py:506-527) ------
        fake_1, _ = gen_forward(
            state.gen.params, state.gen.stats, noise_1, cond, k_g1, bn_mask
        )  # [E, B, H, W, 1]; generator frozen for the D step
        fake_1 = jax.lax.stop_gradient(fake_1)

        def d_loss_fn(d_params):
            (real_scores, _), st1 = disc_forward(d_params, state.disc.stats, real_e, cond)
            (fake_scores, _), st2 = disc_forward(d_params, st1, fake_1, cond)
            d_loss_e = _hinge_d_e(real_scores[..., 0], fake_scores[..., 0], masks)  # [E]
            d_weighted = d_loss_e * w * active_f
            return jnp.sum(d_weighted), (st2, d_weighted)

        d_grads, (disc_stats_new, disc_loss_e) = jax.grad(d_loss_fn, has_aux=True)(
            state.disc.params
        )
        disc_new = masked_expert_update(
            txs["disc"], state.disc, d_grads, active, new_stats=disc_stats_new
        )

        # ------ generator + aux update vs the UPDATED discriminator
        # (reference order: D steps before G inside the same batch) ------
        def g_loss_fn(g_params, a_params):
            fake1, gst1 = gen_forward(g_params, state.gen.stats, noise_1, cond, k_g1, bn_mask)
            fake2, gst2 = gen_forward(g_params, gst1, noise_2, cond, k_g2, bn_mask)
            (s1, l1), dst1 = disc_forward(disc_new.params, disc_new.stats, fake1, cond)
            (s2, l2), dst2 = disc_forward(disc_new.params, dst1, fake2, cond)

            hinge_e = _hinge_g_e(s1[..., 0], masks)  # [E]
            div_e = _sdi_e(l1, l2, noise_1, noise_2, std, di_strength, masks, sdi_quirk)  # [E]
            int_loss_e, sums1, std_int_e, mean_int_e = _intensity_e(
                fake1, intensity, in_strength, masks
            )  # [E], [E,B], [E], [E]
            aux_pred, ast = aux_forward(a_params, state.aux.stats, fake1, k_aux, bn_mask)  # [E, B, 2]
            aux_loss_e = _log_cosh_e(positions, aux_pred, masks) * aux_strength  # [E]

            gen_total_e = (hinge_e + div_e + int_loss_e + aux_loss_e) * w * active_f
            loss = jnp.sum(gen_total_e)
            aux_out = dict(
                gen_loss_e=gen_total_e, div_loss_e=div_e, intensity_loss_e=int_loss_e,
                aux_loss_e=aux_loss_e, mean_int_e=mean_int_e, std_int_e=std_int_e,
                sums1=sums1, fake_scores=s1[..., 0],
                gen_stats=gst2, aux_stats=ast, disc_stats=dst2,
            )
            return loss, aux_out

        (g_grads, a_grads), gaux = jax.grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
            state.gen.params, state.aux.params
        )
        gen_new = masked_expert_update(
            txs["gen"], state.gen, g_grads, active, new_stats=gaux["gen_stats"]
        )
        aux_new = masked_expert_update(
            txs["aux"], state.aux, a_grads, active, new_stats=gaux["aux_stats"]
        )
        # The G-step discriminator forwards advance SN power iteration too
        # (torch updates u every train-mode forward).
        disc_new = Component(
            params=disc_new.params,
            stats=jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    active.reshape((E,) + (1,) * (n.ndim - 1)), n, o
                ) if n.ndim >= 1 and n.shape[0] == E else n,
                gaux["disc_stats"], disc_new.stats,
            ),
            opt_state=disc_new.opt_state,
        )
        ema_params = ema_update(state.ema_gen_params, gen_new.params, ema_decay)

        # Per-sample generated photon sum from the routed expert (the
        # reference's mean_intensities_in_batch_expert, moe.py:197-201).
        sums_routed = jax.lax.stop_gradient(
            jnp.take_along_axis(gaux["sums1"], idx[None, :], axis=0)[0]
        )  # [B]
        mean_int_e_det = jax.lax.stop_gradient(gaux["mean_int_e"]) * active_f
        fake_scores_det = jax.lax.stop_gradient(gaux["fake_scores"])  # [E, B]
        gen_loss_e_det = jax.lax.stop_gradient(gaux["gen_loss_e"])

        # ------ router update (moe.py:213-442) ------
        if E > 1:
            def r_loss_fn(r_params):
                _, logits_r = router_mod.apply({"params": r_params}, cond)
                soft_r = jax.nn.softmax((logits_r + gumbel_noise) / tau, axis=-1)
                hard = jax.nn.one_hot(idx, E, dtype=soft_r.dtype)
                gates_st = hard + soft_r - jax.lax.stop_gradient(soft_r)

                if differentiable_gan:
                    # ST-gate-weighted per-sample hinge (zdcsim divergence,
                    # see module docstring): gradients reach the router.
                    gan_term = jnp.mean(
                        jnp.sum(gates_st.T * (-fake_scores_det), axis=0)
                    ) * gan_strength
                else:
                    gan_term = jnp.mean(gen_loss_e_det) * gan_strength  # constant

                if util_strength != 0.0:
                    entropy_term = -expert_utilization_entropy(soft_r, util_strength)
                else:
                    entropy_term = jnp.asarray(0.0)
                if ed_strength != 0.0:
                    ed_term = (
                        expert_distribution_loss(gates_st, sums_routed[:, None])
                        * ed_strength
                    )
                else:
                    ed_term = jnp.asarray(0.0)
                if diff_strength != 0.0:
                    diff_term = -differentiation_loss(mean_int_e_det) * diff_strength
                else:
                    diff_term = jnp.asarray(0.0)
                if alb_strength != 0.0:
                    alb_term = adaptive_load_balancing_loss(
                        jnp.sum(soft_r, axis=0), alb_strength
                    )
                else:
                    alb_term = jnp.asarray(0.0)
                decreasing_w = alb_annealing_weight(epoch_f, alpha, min_weight)
                loss = ed_term + gan_term + diff_term + entropy_term + decreasing_w * alb_term
                return loss, dict(
                    gan=gan_term, entropy=entropy_term, ed=ed_term, diff=diff_term, alb=alb_term
                )

            r_grads, raux = jax.grad(r_loss_fn, has_aux=True)(state.router.params)
            router_enabled = (
                jnp.asarray(True)
                if stop_epoch is None
                else jnp.asarray(epoch, jnp.int32) < int(stop_epoch)
            )
            router_new = gated_update(txs["router"], state.router, r_grads, router_enabled)
            router_loss = jnp.where(
                router_enabled,
                raux["ed"] + raux["gan"] + raux["diff"] + raux["entropy"]
                + alb_annealing_weight(epoch_f, alpha, min_weight) * raux["alb"],
                0.0,
            )
        else:
            router_new = state.router
            router_loss = jnp.asarray(0.0)
            raux = dict(gan=jnp.asarray(0.0), entropy=jnp.asarray(0.0),
                        ed=jnp.asarray(0.0), diff=jnp.asarray(0.0), alb=jnp.asarray(0.0))

        new_state = MoETrainState(
            gen=gen_new, disc=disc_new, aux=aux_new, router=router_new,
            ema_gen_params=ema_params, step=state.step + 1,
        )

        # Metric names mirror the reference log dict (moe.py:480-504).
        zero_inactive = lambda x: jnp.where(active, x, 0.0)
        metrics = {
            "gen_loss": jnp.mean(gen_loss_e_det),
            "disc_loss": jnp.mean(jax.lax.stop_gradient(disc_loss_e)),
            "div_loss": jnp.mean(zero_inactive(gaux["div_loss_e"])),
            "intensity_loss": jnp.mean(zero_inactive(gaux["intensity_loss_e"])),
            "aux_reg_loss": jnp.mean(zero_inactive(gaux["aux_loss_e"])),
            "router_loss": router_loss,
            "expert_distribution_loss": raux["ed"],
            "differentiation_loss": -raux["diff"],
            "expert_entropy_loss": raux["entropy"],
            "adaptive_load_balancing_loss": raux["alb"],
            "gan_loss": raux["gan"],
            "tau": tau,
            "gen_loss_experts": gen_loss_e_det,
            "disc_loss_experts": jax.lax.stop_gradient(disc_loss_e),
            "div_loss_experts": zero_inactive(gaux["div_loss_e"]),
            "intensity_loss_experts": zero_inactive(gaux["intensity_loss_e"]),
            "aux_reg_loss_experts": zero_inactive(gaux["aux_loss_e"]),
            "std_intensities_experts": zero_inactive(gaux["std_int_e"]),
            "mean_intensities_experts": mean_int_e_det,
            "n_choosen_experts_mean_epoch": w,
        }
        metrics = jax.lax.stop_gradient(metrics)
        return new_state, metrics

    # ------------------------------------------------------------------
    # Single-expert-FLOPs dispatch (train.dispatch: switch).
    #
    # The dense step computes every (sample, expert) pair and masks the
    # losses; its gradients only ever come from routed pairs, so decoding/
    # scoring each sample with ONLY its routed expert (tiled-switch
    # dispatch, zdcsim.inference.switch_dispatch.tiled_switch_apply)
    # produces the same masked losses and gradients at ~1/E of the G/D/aux
    # FLOPs. Semantic constraints (all documented divergences):
    #   - router GAN term falls back to the reference-faithful constant
    #     (moe.py:176-207) — the differentiable variant needs ALL-pair
    #     fake scores which switch dispatch deliberately never computes;
    #   - requires stats-free generator/aux (proton family, neutron
    #     norm=group) — per-sub-batch BN needs the dense step;
    #   - discriminator spectral-norm power iteration is data-independent,
    #     so it advances via a 1-sample dense forward per D/G phase
    #     (2 advances/step vs dense's 4; both converge to the dominant
    #     singular vector);
    #   - dropout masks draw per (expert, chunk) instead of per dense row.
    # ------------------------------------------------------------------
    dispatch = str(cfg.train.get("dispatch", "dense"))
    switch_tile = int(cfg.train.get("dispatch_tile", 128))
    # Checkpoint the per-chunk forwards: without it the scan-under-grad
    # stacks every chunk's activations and OOMs HBM at B=512 (measured
    # 14.5G of HLO temps, perf_train_r3). Opt-out knob for tiny models.
    switch_remat = bool(cfg.train.get("dispatch_remat", True))
    use_switch = dispatch == "switch" and E > 1
    if use_switch and (
        modules.generator_single is None
        or modules.discriminator_single is None
        or modules.aux_reg_single is None
    ):
        raise ValueError("train.dispatch=switch needs single-module handles on MoEModules")

    def _switch_dispatch(make_fns, cap, idx_, inputs):
        """Route ``inputs`` through per-expert closures built by
        ``make_fns(cap)`` (``cap`` carries every traced value the closures
        need — params/stats/rng keys — explicitly, so it can cross a
        shard_map boundary).

        Single device: plain :func:`tiled_switch_apply`. Under a mesh the
        dispatch runs PER-DEVICE inside ``shard_map`` with the batch sharded
        over the WHOLE device grid — the data axis and, when
        ``parallel.expert_parallel>1``, the expert axis too: switch dispatch
        is a data-parallel construct, so the expert axis contributes extra
        data parallelism here instead of replicating compute (each device
        sorts/tiles its own smaller batch sub-shard). The expert-sharded
        params in ``cap`` are all-gathered once at the boundary
        (``lax.switch`` needs every expert on every device; these
        generators are KBs-MBs, negligible next to one chunk's decode) —
        the same structure as sharded switch serving (engine.py
        sim_switch). shard_map's transpose psums the cotangent of the
        replicated ``cap`` over both axes, which is exactly the
        all-device gradient reduction; equality with the dense sharded
        step at expert_parallel=2 is tested on the virtual 8-device mesh
        (tests/test_parallel.py).
        """
        from zdcsim.inference.switch_dispatch import tiled_switch_apply

        if mesh is None:
            return tiled_switch_apply(
                make_fns(cap), idx_, inputs, tile=switch_tile, remat=switch_remat
            )
        import math

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from zdcsim.parallel.mesh import DATA_AXIS, EXPERT_AXIS

        batch_axes = (
            (DATA_AXIS, EXPERT_AXIS)
            if mesh.shape.get(EXPERT_AXIS, 1) > 1 else (DATA_AXIS,)
        )

        def local(cap_l, idx_l, inputs_l):
            lb = int(idx_l.shape[0])
            return tiled_switch_apply(
                make_fns(cap_l), idx_l, inputs_l,
                tile=math.gcd(lb, switch_tile), remat=switch_remat,
            )

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(batch_axes), P(batch_axes)),
            out_specs=P(batch_axes),
        )(cap, idx_, inputs)

    def train_step_switch(state, batch, key, epoch):
        if len(jax.tree_util.tree_leaves(state.gen.stats)) or len(
            jax.tree_util.tree_leaves(state.aux.stats)
        ):
            raise ValueError(
                "train.dispatch=switch requires stats-free generator/aux "
                "(proton, or neutron with model.norm=group); use dense for "
                "per-sub-batch BatchNorm semantics"
            )
        real = batch["real"]
        cond = batch["cond"]
        std = batch["std"]
        intensity = batch["intensity"]
        positions = batch["positions"]
        B = real.shape[0]

        k_gumbel, k_n1, k_n2, k_g1, k_g2, k_aux = jax.random.split(key, 6)
        epoch_f = jnp.asarray(epoch, jnp.float32)
        tau = tau_schedule(epoch_f, tau_start, tau_min, tau_decay)

        _, logits = router_mod.apply({"params": state.router.params}, cond)
        gumbel_noise = jax.random.gumbel(k_gumbel, logits.shape, logits.dtype)
        gates_soft = jax.nn.softmax((logits + gumbel_noise) / tau, axis=-1)
        idx = jnp.argmax(gates_soft, axis=-1)
        masks = expert_masks(idx, E)
        counts = jnp.sum(masks, axis=1)
        w = counts / B
        active = counts > 1.0
        active_f = active.astype(jnp.float32)

        noise_1 = jax.random.normal(k_n1, (B, noise_dim))
        noise_2 = jax.random.normal(k_n2, (B, noise_dim))
        idx2 = jnp.concatenate([idx, idx])
        rid2 = jnp.arange(2 * B, dtype=jnp.int32)
        cond2 = jnp.concatenate([cond, cond])
        noise12 = jnp.concatenate([noise_1, noise_2])

        gen_single = modules.generator_single
        disc_single = modules.discriminator_single
        aux_single = modules.aux_reg_single
        slice_e = lambda tree, e: jax.tree_util.tree_map(lambda p: p[e], tree)

        def make_gen_fns(cap):
            g_params, kg = cap["p"], cap["k"]

            def mk(e):
                def fn(chunk):
                    rng = jax.random.fold_in(jax.random.fold_in(kg, e), chunk["rid"][0])
                    out = gen_single.apply(
                        {"params": _c16(slice_e(g_params, e))},
                        _c16(chunk["z"]), _c16(chunk["c"]), True,
                        rngs={"dropout": rng},
                    )
                    return out.astype(jnp.float32)

                return fn

            return [mk(e) for e in range(E)]

        def make_disc_fns(cap):
            d_params, d_stats = cap["p"], cap["stats"]

            def mk(e):
                def fn(chunk):
                    # SN u is read, not updated (advanced separately below)
                    variables = {
                        "params": _c16(slice_e(d_params, e)),
                        **{k: slice_e(v, e) for k, v in d_stats.items()},
                    }
                    s, latent = disc_single.apply(
                        variables, _c16(chunk["img"]), _c16(chunk["c"]), False
                    )
                    return s.astype(jnp.float32), latent.astype(jnp.float32)

                return fn

            return [mk(e) for e in range(E)]

        def make_aux_fns(cap):
            a_params, ka = cap["p"], cap["k"]

            def mk(e):
                def fn(chunk):
                    rng = jax.random.fold_in(jax.random.fold_in(ka, e), chunk["rid"][0])
                    out = aux_single.apply(
                        {"params": _c16(slice_e(a_params, e))},
                        _c16(chunk["img"]), True, rngs={"dropout": rng},
                    )
                    return out.astype(jnp.float32)

                return fn

            return [mk(e) for e in range(E)]

        # ------ discriminator update ------
        fake_1 = jax.lax.stop_gradient(
            _switch_dispatch(
                make_gen_fns, {"p": state.gen.params, "k": k_g1}, idx,
                {"z": noise_1, "c": cond, "rid": rid2[:B]},
            )
        )  # [B, H, W, 1] routed

        def d_loss_fn(d_params):
            s, _ = _switch_dispatch(
                make_disc_fns, {"p": d_params, "stats": state.disc.stats}, idx2,
                {"img": jnp.concatenate([real, fake_1]), "c": cond2},
            )
            real_sc, fake_sc = s[:B, 0], s[B:, 0]
            d_loss_e = _hinge_d_r(real_sc, fake_sc, masks)
            d_weighted = d_loss_e * w * active_f
            return jnp.sum(d_weighted), d_weighted

        d_grads, disc_loss_e = jax.grad(d_loss_fn, has_aux=True)(state.disc.params)
        # SN power iteration is data-independent: one dense 1-sample forward
        # advances u/v per expert at negligible cost.
        _, disc_stats_adv = disc_forward(
            state.disc.params, state.disc.stats, real[None, :1].repeat(E, 0), cond[:1]
        )
        disc_new = masked_expert_update(
            txs["disc"], state.disc, d_grads, active, new_stats=disc_stats_adv
        )

        # ------ generator + aux update vs the updated discriminator ------
        def g_loss_fn(g_params, a_params):
            fakes = _switch_dispatch(
                make_gen_fns, {"p": g_params, "k": k_g2}, idx2,
                {"z": noise12, "c": cond2, "rid": rid2},
            )
            fake1, fake2 = fakes[:B], fakes[B:]
            s, latents = _switch_dispatch(
                make_disc_fns, {"p": disc_new.params, "stats": state.disc.stats}, idx2,
                {"img": jnp.concatenate([fake1, fake2]), "c": cond2},
            )
            s1, l1 = s[:B, 0], latents[:B]
            s2, l2 = s[B:, 0], latents[B:]
            aux_pred = _switch_dispatch(
                make_aux_fns, {"p": a_params, "k": k_aux}, idx,
                {"img": fake1, "rid": rid2[:B]},
            )

            hinge_e = _hinge_g_r(s1, masks)
            div_e = _sdi_r(l1, l2, noise_1, noise_2, std, di_strength, masks, sdi_quirk)
            int_loss_e, sums_r, std_int_e, mean_int_e = _intensity_r(
                fake1, intensity, in_strength, masks
            )
            aux_loss_e = _log_cosh_r(positions, aux_pred, masks) * aux_strength

            gen_total_e = (hinge_e + div_e + int_loss_e + aux_loss_e) * w * active_f
            aux_out = dict(
                gen_loss_e=gen_total_e, div_loss_e=div_e, intensity_loss_e=int_loss_e,
                aux_loss_e=aux_loss_e, mean_int_e=mean_int_e, std_int_e=std_int_e,
                sums_routed=sums_r[0],
            )
            return jnp.sum(gen_total_e), aux_out

        (g_grads, a_grads), gaux = jax.grad(g_loss_fn, argnums=(0, 1), has_aux=True)(
            state.gen.params, state.aux.params
        )
        gen_new = masked_expert_update(txs["gen"], state.gen, g_grads, active)
        aux_new = masked_expert_update(txs["aux"], state.aux, a_grads, active)
        _, disc_stats_adv2 = disc_forward(
            disc_new.params, disc_new.stats, real[None, :1].repeat(E, 0), cond[:1]
        )
        disc_new = Component(
            params=disc_new.params,
            stats=jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    active.reshape((E,) + (1,) * (n.ndim - 1)), n, o
                ) if n.ndim >= 1 and n.shape[0] == E else n,
                disc_stats_adv2, disc_new.stats,
            ),
            opt_state=disc_new.opt_state,
        )
        ema_params = ema_update(state.ema_gen_params, gen_new.params, ema_decay)

        sums_routed = jax.lax.stop_gradient(gaux["sums_routed"])
        mean_int_e_det = jax.lax.stop_gradient(gaux["mean_int_e"]) * active_f
        gen_loss_e_det = jax.lax.stop_gradient(gaux["gen_loss_e"])

        # ------ router update (constant GAN term — see block comment) ------
        def r_loss_fn(r_params):
            _, logits_r = router_mod.apply({"params": r_params}, cond)
            soft_r = jax.nn.softmax((logits_r + gumbel_noise) / tau, axis=-1)
            hard = jax.nn.one_hot(idx, E, dtype=soft_r.dtype)
            gates_st = hard + soft_r - jax.lax.stop_gradient(soft_r)
            gan_term = jnp.mean(gen_loss_e_det) * gan_strength
            entropy_term = (
                -expert_utilization_entropy(soft_r, util_strength)
                if util_strength != 0.0 else jnp.asarray(0.0)
            )
            ed_term = (
                expert_distribution_loss(gates_st, sums_routed[:, None]) * ed_strength
                if ed_strength != 0.0 else jnp.asarray(0.0)
            )
            diff_term = (
                -differentiation_loss(mean_int_e_det) * diff_strength
                if diff_strength != 0.0 else jnp.asarray(0.0)
            )
            alb_term = (
                adaptive_load_balancing_loss(jnp.sum(soft_r, axis=0), alb_strength)
                if alb_strength != 0.0 else jnp.asarray(0.0)
            )
            decreasing_w = alb_annealing_weight(epoch_f, alpha, min_weight)
            loss = ed_term + gan_term + diff_term + entropy_term + decreasing_w * alb_term
            return loss, dict(
                gan=gan_term, entropy=entropy_term, ed=ed_term, diff=diff_term, alb=alb_term
            )

        r_grads, raux = jax.grad(r_loss_fn, has_aux=True)(state.router.params)
        router_enabled = (
            jnp.asarray(True)
            if stop_epoch is None
            else jnp.asarray(epoch, jnp.int32) < int(stop_epoch)
        )
        router_new = gated_update(txs["router"], state.router, r_grads, router_enabled)
        router_loss = jnp.where(
            router_enabled,
            raux["ed"] + raux["gan"] + raux["diff"] + raux["entropy"]
            + alb_annealing_weight(epoch_f, alpha, min_weight) * raux["alb"],
            0.0,
        )

        new_state = MoETrainState(
            gen=gen_new, disc=disc_new, aux=aux_new, router=router_new,
            ema_gen_params=ema_params, step=state.step + 1,
        )
        zero_inactive = lambda x: jnp.where(active, x, 0.0)
        metrics = {
            "gen_loss": jnp.mean(gen_loss_e_det),
            "disc_loss": jnp.mean(jax.lax.stop_gradient(disc_loss_e)),
            "div_loss": jnp.mean(zero_inactive(gaux["div_loss_e"])),
            "intensity_loss": jnp.mean(zero_inactive(gaux["intensity_loss_e"])),
            "aux_reg_loss": jnp.mean(zero_inactive(gaux["aux_loss_e"])),
            "router_loss": router_loss,
            "expert_distribution_loss": raux["ed"],
            "differentiation_loss": -raux["diff"],
            "expert_entropy_loss": raux["entropy"],
            "adaptive_load_balancing_loss": raux["alb"],
            "gan_loss": raux["gan"],
            "tau": tau,
            "gen_loss_experts": gen_loss_e_det,
            "disc_loss_experts": jax.lax.stop_gradient(disc_loss_e),
            "div_loss_experts": zero_inactive(gaux["div_loss_e"]),
            "intensity_loss_experts": zero_inactive(gaux["intensity_loss_e"]),
            "aux_reg_loss_experts": zero_inactive(gaux["aux_loss_e"]),
            "std_intensities_experts": zero_inactive(gaux["std_int_e"]),
            "mean_intensities_experts": mean_int_e_det,
            "n_choosen_experts_mean_epoch": w,
        }
        return new_state, jax.lax.stop_gradient(metrics)

    step_fn = train_step_switch if use_switch else train_step

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    from zdcsim.parallel.mesh import batch_sharding, replicated, state_shardings

    if example_state is None:
        raise ValueError("mesh-compiled train step needs example_state for sharding structure")
    ss = state_shardings(mesh, example_state, E)
    bs = {k: batch_sharding(mesh) for k in ("real", "cond", "std", "intensity", "positions")}
    rep = replicated(mesh)
    # Pin the OUTPUT state to the same shardings — otherwise the partitioner
    # may choose a different layout for updated leaves and the next call's
    # in_shardings reject the fed-back state.
    return jax.jit(
        step_fn,
        in_shardings=(ss, bs, rep, rep),
        out_shardings=(ss, None),
        donate_argnums=(0,),
    )
