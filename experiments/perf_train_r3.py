"""Round-3 training-step performance study (VERDICT item 2).

Measures, on the real chip, ms/step and samples/s/chip for the full MoE
train step across the levers that matter, plus XLA's own FLOP count per
step (``compiled.cost_analysis()``) so utilization can be stated against
the v5e peak (197 TFLOPs bf16 dense).

Timing method: N steps chained through the donated state (device pipeline
stays full; dispatches are async), ONE scalar readback at the end — the
~26 ms per-dispatch RTT of this link amortizes over the chain.

Arms:
  dense f32 / dense bf16 / dense bf16 + fast_generator /
  SWITCH bf16 (single-expert-FLOPs dispatch, train.dispatch=switch) /
  switch bf16 tile sweep / E=1 bf16 / E=5 B=256 bf16 (+remat).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from zdcsim.config import load_config  # noqa: E402
from zdcsim.models import build_moe  # noqa: E402
from zdcsim.train.state import init_state_jit  # noqa: E402
from zdcsim.train.step import build_train_step  # noqa: E402

V5E_BF16_PEAK = 197e12


def make_batch(key, b, shape=(56, 30)):
    ks = jax.random.split(key, 5)
    return {
        "real": jnp.abs(jax.random.normal(ks[0], (b, *shape, 1))),
        "cond": jax.random.normal(ks[1], (b, 9)),
        "std": jax.random.uniform(ks[2], (b, 1)),
        "intensity": jax.random.uniform(ks[3], (b, 1)) * 1000,
        "positions": jax.random.uniform(ks[4], (b, 2)) * 30,
    }


def bench_arm(name, overrides, b, n_steps=10):
    cfg = load_config(overrides=overrides)
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    batch = make_batch(jax.random.PRNGKey(1), b)
    key = jax.random.PRNGKey(2)

    # compile + warm
    state, m = step(state, batch, key, jnp.asarray(0))
    _ = float(m["gen_loss"])
    flops = None
    try:
        lowered = None  # cost via the traced executable if exposed
        ca = step.lower(state, batch, key, jnp.asarray(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print(f"  (cost_analysis unavailable: {type(e).__name__})", flush=True)

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = step(state, batch, jax.random.fold_in(key, i), jnp.asarray(0))
    _ = float(m["gen_loss"])  # forces the whole chain
    dt = (time.perf_counter() - t0) / n_steps
    sps = b / dt
    line = f"{name:40s} {dt*1e3:8.1f} ms/step {sps:9,.0f} samples/s"
    if flops and flops == flops:
        tf = flops / dt / 1e12
        line += f"  {flops/1e9:8.1f} GFLOP/step  {tf:6.1f} TFLOPs ({tf/197:.0%} bf16 peak)"
    print(line, flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    B = 512
    base = [f"train.batch_size={B}", "model.n_experts=3",
            "model.router.differentiable_gan_term=false"]

    print(f"\n--- full train step, E=3 B={B} (10-step chained timing) ---", flush=True)
    t_f32 = bench_arm("dense f32", base + ["train.precision=f32"], B)
    t_bf16 = bench_arm("dense bf16", base + ["train.precision=bf16"], B)
    bench_arm("dense bf16 + fast_generator",
              base + ["train.precision=bf16", "train.fast_generator=true"], B)
    t_sw = bench_arm("SWITCH bf16 tile=64",
                     base + ["train.precision=bf16", "train.dispatch=switch"], B)
    for tile in (128, 256):
        bench_arm(f"SWITCH bf16 tile={tile}",
                  base + ["train.precision=bf16", "train.dispatch=switch",
                          f"train.dispatch_tile={tile}"], B)
    print(f"\nswitch speedup vs dense bf16: {t_bf16/t_sw:.2f}x", flush=True)

    print("\n--- scaling arms ---", flush=True)
    bench_arm("dense bf16 E=1", ["train.batch_size=512", "model.n_experts=1",
                                 "train.precision=bf16"], 512)
    bench_arm("dense bf16 E=5 B=256 remat",
              ["train.batch_size=256", "model.n_experts=5",
               "train.precision=bf16", "train.remat=true",
               "model.router.differentiable_gan_term=false"], 256)
    bench_arm("SWITCH bf16 E=5 B=256",
              ["train.batch_size=256", "model.n_experts=5",
               "train.precision=bf16", "train.dispatch=switch",
               "model.router.differentiable_gan_term=false"], 256)

    # reference point: default config's differentiable gan term (dense only)
    print("\n--- dense with differentiable router GAN term (zdcsim default) ---",
          flush=True)
    bench_arm("dense bf16 diff-gan", [f"train.batch_size={B}", "model.n_experts=3",
                                      "train.precision=bf16"], B)


if __name__ == "__main__":
    main()
