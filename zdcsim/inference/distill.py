"""Serving-time expert distillation — fidelity-gated width reduction.

The round-3 serving study ended with the conv stages as the measured wall:
of the 24.2 us/shower bulk decode, ~22.5 us is the three int8 convs
(BENCH_LOG stage budget), every XLA- and Pallas-level ladder around them
is exhausted, and the remaining gap to the 50k showers/s north star cannot
come from overhead alone. The mechanism that CAN close it is fewer conv
FLOPs: distill each trained teacher expert into a width-scaled student
(:class:`zdcsim.models.proton.Generator` with ``width<1`` — same param-tree
layout, so the whole fast/int8 serving stack applies unchanged) and serve
the student wherever it passes the SAME fidelity gate the teacher must
pass (fidelity.py's 1.5x-floor criterion).

Distillation here is plain function regression, not GAN training: each
student expert matches its teacher expert's log-space output on the
conditioning distribution the router actually sends it, drawing fresh
``(noise, cond)`` pairs every step (infinite data — no overfitting arm).
The loss is per-pixel L2 plus a relative channel-sum term (the 5-channel
photon sums are exactly what the WS-1 fidelity metric scores — reference
metric semantics expertsim/train/utils.py:117-176).

No reference counterpart: the reference serves its full generator
(train/utils.py:208-266); distillation is a new TPU-era capability.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from zdcsim.ops.channels import sum_channels


def build_distill_step(
    student_apply,
    teacher_apply,
    router_apply,
    tx,
    noise_dim: int,
    *,
    sum_weight: float = 0.1,
    off_routed_weight: float = 0.1,
    inner_steps: int = 25,
):
    """Returns ``step(params, opt_state, cond_pool, key) -> (params,
    opt_state, metrics)`` running ``inner_steps`` distillation updates in ONE
    jitted program (per-call dispatch costs ~26 ms on the tunnel link; the
    inner ``lax.scan`` amortizes it).

    Args:
        student_apply: ``(params, noise[B,Z], cond[B,C]) -> [E,B,H,W,1]``.
        teacher_apply: same signature (params baked in), outputs stop-graded.
        router_apply: ``cond -> idx[B]`` deterministic routing.
        tx: optax transform for the student params.
        sum_weight: weight of the relative linear-space channel-sum term.
        off_routed_weight: loss weight of samples NOT routed to an expert
            (routed samples weigh 1.0) — keeps each student a full surrogate
            of its teacher without spending capacity off-distribution.
    """

    def loss_fn(params, noise, cond):
        t_out = jax.lax.stop_gradient(teacher_apply(noise, cond))  # [E,B,H,W,1]
        s_out = student_apply(params, noise, cond)
        idx = router_apply(cond)  # [B]
        e_count = t_out.shape[0]
        masks = jax.nn.one_hot(idx, e_count, dtype=s_out.dtype).T  # [E,B]
        wts = masks + off_routed_weight * (1.0 - masks)
        wts = wts / jnp.sum(wts, axis=1, keepdims=True)  # [E,B]

        pix = jnp.mean((s_out - t_out) ** 2, axis=(2, 3, 4))  # [E,B]
        pix_loss = jnp.sum(wts * pix) / e_count

        ch_t = sum_channels(jnp.expm1(t_out[..., 0].reshape(-1, *t_out.shape[2:4])))
        ch_s = sum_channels(jnp.expm1(s_out[..., 0].reshape(-1, *s_out.shape[2:4])))
        rel = jnp.mean(
            jnp.abs(ch_s - ch_t) / (jnp.abs(ch_t) + 10.0), axis=-1
        ).reshape(e_count, -1)  # [E,B]
        sum_loss = jnp.sum(wts * rel) / e_count

        loss = pix_loss + sum_weight * sum_loss
        return loss, {"pix": pix_loss, "chsum": sum_loss}

    def step(params, opt_state, cond_pool, key, batch_size: int):
        def scan_body(carry, k):
            params, opt_state = carry
            k_row, k_z = jax.random.split(k)
            rows = jax.random.randint(k_row, (batch_size,), 0, cond_pool.shape[0])
            cond = cond_pool[rows]
            noise = jax.random.normal(k_z, (batch_size, noise_dim), cond.dtype)
            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, noise, cond
            )
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), {
                "loss": loss, **parts
            }

        keys = jax.random.split(key, inner_steps)
        (params, opt_state), metrics = jax.lax.scan(
            scan_body, (params, opt_state), keys
        )
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return params, opt_state, last

    return jax.jit(step, static_argnames=("batch_size",), donate_argnums=(0, 1))


def distill_generator(
    student_module,
    student_params,
    teacher_apply,
    router_apply,
    cond_pool,
    key: jax.Array,
    noise_dim: int,
    *,
    steps: int = 2000,
    batch_size: int = 256,
    lr: float = 2e-3,
    inner_steps: int = 25,
    sum_weight: float = 0.1,
    off_routed_weight: float = 0.1,
    log_every: int = 250,
    logger=None,
) -> Tuple[Any, Dict[str, float]]:
    """Train a width-scaled student generator against a frozen teacher.

    Returns ``(student_params, final_metrics)``. ``teacher_apply`` /
    ``router_apply`` carry their weights closed-over (they are never
    differentiated); ``student_module`` is the expert-stacked student whose
    ``params`` are optimized. Cosine-decayed Adam; fresh ``(noise, cond)``
    draws per update from the device-resident ``cond_pool``.
    """
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(student_params)

    def student_apply(params, noise, cond):
        return student_module.apply({"params": params}, noise, cond, False)

    step = build_distill_step(
        student_apply, teacher_apply, router_apply, tx, noise_dim,
        sum_weight=sum_weight, off_routed_weight=off_routed_weight,
        inner_steps=inner_steps,
    )
    cond_pool = jnp.asarray(cond_pool)
    params, metrics = student_params, {}
    n_calls = max(1, steps // inner_steps)
    for i in range(n_calls):
        params, opt_state, metrics = step(
            params, opt_state, cond_pool, jax.random.fold_in(key, i), batch_size
        )
        if logger is not None and (i * inner_steps) % log_every < inner_steps:
            # one scalar readback per log line (device sync point)
            logger(
                f"distill step {min((i + 1) * inner_steps, steps)}/{steps}: "
                f"loss={float(metrics['loss']):.5f} "
                f"pix={float(metrics['pix']):.5f} "
                f"chsum={float(metrics['chsum']):.5f}"
            )
    return params, {k: float(v) for k, v in metrics.items()}
