#!/usr/bin/env python
"""Training-throughput benchmark — the training-side headline next to
bench.py (serving) and fidelity.py (physics).

Prints ONE JSON line:
``{"metric": "train_step_throughput", "value": <samples/s, production
switch recipe>, "unit": "samples/sec/chip", "vs_baseline":
<switch speedup over dense bf16>, "dense": {...}, "switch": {...}}``.

Measures the FULL MoE train step (D + G/aux + router updates — the loop the
reference runs as 2E+1 separate backward passes per batch,
expertsim/models/moe.py:52-504) at the reference's own default scale:
batch 512, 3 experts, 250-epoch recipe hyperparameters
(expertsim/config/default.yaml:50-51). Two arms:

- ``dense``: bf16 compute-all-experts step (zdcsim's fidelity-default
  recipe, differentiable router GAN term). Reports achieved TFLOPs vs the
  v5e bf16 dense peak (197 TFLOPs) from XLA's own cost analysis.
- ``switch``: tiled-switch dispatch at the measured-optimal tile
  (T=128 + remat, BENCH_LOG "round-4 switch-step ladder") with the
  constant router GAN term — the validated throughput recipe (fidelity
  gate 1.219x PASS at 250 epochs, BENCH_LOG "switch recipe at
  reference-default scale").

Timing: N steps chained through the donated state, one scalar readback at
the end (per-call timings are RTT-poisoned on this link — CLAUDE.md).

The reference publishes no training-throughput numbers (BASELINE.md), so
``vs_baseline`` reports the switch recipe's speedup over the dense step —
the framework's own headline lever at reference scale.
"""

from __future__ import annotations

import json
import sys
import time

V5E_BF16_PEAK = 197e12
B = 512
N_STEPS = 16


def bench_arm(overrides, n_steps=N_STEPS):
    import jax
    import jax.numpy as jnp

    from zdcsim.config import load_config
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit
    from zdcsim.train.step import build_train_step

    cfg = load_config(overrides=overrides)
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)

    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    batch = {
        "real": jnp.abs(jax.random.normal(ks[0], (B, 56, 30, 1))),
        "cond": jax.random.normal(ks[1], (B, 9)),
        "std": jax.random.uniform(ks[2], (B, 1)),
        "intensity": jax.random.uniform(ks[3], (B, 1)) * 1000,
        "positions": jax.random.uniform(ks[4], (B, 2)) * 30,
    }
    key = jax.random.PRNGKey(2)

    flops = None
    try:
        ca = step.lower(state, batch, key, jnp.asarray(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        pass

    state, m = step(state, batch, key, jnp.asarray(0))  # compile + warm
    _ = float(m["gen_loss"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.fold_in(key, i), jnp.asarray(0))
    _ = float(m["gen_loss"])  # one readback forces the whole chain
    dt = (time.perf_counter() - t0) / n_steps
    arm = {
        "ms_per_step": round(dt * 1e3, 1),
        "steps_per_sec": round(1.0 / dt, 3),
        "samples_per_sec": round(B / dt, 1),
    }
    if flops and flops == flops:
        arm["gflop_per_step"] = round(flops / 1e9, 1)
        arm["tflops_achieved"] = round(flops / dt / 1e12, 1)
        arm["bf16_peak_frac"] = round(flops / dt / V5E_BF16_PEAK, 3)
    return arm


def main() -> int:
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()

    base = [f"train.batch_size={B}", "model.n_experts=3",
            "train.precision=bf16"]
    dense = bench_arm(base)
    switch = bench_arm(base + [
        "model.router.differentiable_gan_term=false",
        "train.dispatch=switch", "train.dispatch_tile=128",
        "train.dispatch_remat=true",
    ])
    value = switch["samples_per_sec"]
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": value,
        "unit": "samples/sec/chip",
        "vs_baseline": round(dense["ms_per_step"] / switch["ms_per_step"], 3),
        "scale": {"batch": B, "n_experts": 3, "precision": "bf16"},
        "dense": dense,
        "switch": switch,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
