"""Round-3 serving levers, XLA-only (after the ablation verdict).

perf_decode_ablate_r3.py: T=64 optimal at every batch; all Pallas bulk
arms lose (custom-call relayout + tiny per-tile grids). The remaining
levers are pure-XLA decode changes measured here:

  - bf16 dequant/interleave in the int8 conv0/conv1 paths (halves the
    phase-output HBM traffic in bf16 serving);
  - int8 Conv_2 (the tail's dominant conv).

Measures the new decode at B=4096 (in-jit x8; old decode was 123.6 ms)
and bulk int8 throughput at the bench config (was 39.7-40.4k showers/s).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")


def rep(op, iters=8):
    def run(x):
        def body(c, _):
            y = op(c)
            s = (jnp.sum(y) * jnp.asarray(1e-30, jnp.float32)).astype(c.dtype)
            return c + s, None

        xf, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(xf)

    return jax.jit(run)


def timeit(f, x, name, per=8, reps=3):
    out = f(x)
    s = float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
        s = float(jnp.asarray(out).sum())
    dt = (time.perf_counter() - t0) / reps / per
    print(f"{name:56s} {dt*1e3:9.3f} ms  ({s:.3e})", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.models.proton_fast import fast_generator_apply
    from zdcsim.train.state import init_state_jit

    key = jax.random.PRNGKey(0)
    B = 4096

    cfg = load_config(overrides=["model.n_experts=1"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    gp1 = jax.tree_util.tree_map(
        lambda p: p[0].astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p[0],
        state.gen.params,
    )
    noise = jax.random.normal(key, (B, 10), jnp.bfloat16)
    cond = jax.random.normal(key, (B, 9), jnp.bfloat16)

    print(f"\n--- decode int8 XLA (bf16 dequant + int8 conv2) at B={B} ---",
          flush=True)

    def dec(nz):
        return fast_generator_apply(gp1, nz, cond, int8=True)

    timeit(rep(dec), noise, "decode int8 xla NEW (was 123.6 ms)")

    print("\n--- production bulk serving (T=64, n=131072) ---", flush=True)
    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    for batch in (32768, 65536):
        eng = FastSim.from_state(
            modules3, state3, use_ema=False, batch_size=batch, precision="int8")
        eng._build_switch(tile=64)
        for rep_i in range(2):
            stats = eng.throughput_bulk(n_showers=131072)
            print(f"bulk int8 B={batch} T=64 rep{rep_i}: "
                  f"{stats['showers_per_sec']:,.0f} showers/s", flush=True)


if __name__ == "__main__":
    main()
