"""Round-3 follow-up: the mixed Pallas backend ("pallas_ab").

perf_serve_r3.py measured on chip: kernel B (fused all-phase Conv_0) wins
1.8x over the XLA int8 phases (40.5 vs 73.6 ms at B=4096), but the full
4-kernel decode LOSES (153 vs 123 ms) — kernels C+D are net-negative.
This measures the mixed point: Pallas A+B, XLA int8 C onwards.

  1. decode int8: xla vs pallas_ab (in-jit x8).
  2. engine bulk throughput: int8 vs int8_pallas_ab at the bench config.
  3. if pallas_ab wins: tile/batch sanity ladder around the bench config.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")


def rep_op(op, x0, iters):
    def run(x):
        def body(c, _):
            y = op(c)
            s = jnp.sum(y).astype(c.dtype) * jnp.asarray(1e-30, c.dtype)
            return c + s, None

        xf, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(xf)

    return jax.jit(run)


def timeit(f, *args, reps=3, name="", per=1):
    out = f(*args)
    s = float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
        s = float(jnp.asarray(out).sum())
    dt = (time.perf_counter() - t0) / reps / per
    print(f"{name:52s} {dt*1e3:9.3f} ms  ({s:.3e})", flush=True)
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

    print(f"\n--- full single-expert decode at B={B} (in-jit x8) ---", flush=True)
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

    for backend in ("xla", "pallas_ab"):
        def dec(nz, be=backend):
            return fast_generator_apply(gp1, nz, cond, int8=True, int8_backend=be)

        timeit(rep_op(dec, noise, 8), noise, name=f"decode int8 {backend}", per=8)

    print("\n--- production bulk serving (B=32768 T=64 n=131072) ---", flush=True)
    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    results = {}
    for prec in ("int8", "int8_pallas_ab"):
        eng = FastSim.from_state(
            modules3, state3, use_ema=False, batch_size=32768, precision=prec
        )
        eng._build_switch(tile=64)
        stats = eng.throughput_bulk(n_showers=131072)
        results[prec] = stats["showers_per_sec"]
        print(f"bulk {prec:16s}: {stats['showers_per_sec']:,.0f} showers/s", flush=True)

    if results.get("int8_pallas_ab", 0) > results.get("int8", 0):
        print("\n--- pallas_ab config ladder ---", flush=True)
        for batch, tile in ((32768, 128), (32768, 32), (16384, 64), (65536, 64)):
            try:
                eng = FastSim.from_state(
                    modules3, state3, use_ema=False, batch_size=batch,
                    precision="int8_pallas_ab",
                )
                eng._build_switch(tile=tile)
                stats = eng.throughput_bulk(n_showers=131072)
                print(f"B={batch} T={tile}: {stats['showers_per_sec']:,.0f} showers/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"B={batch} T={tile}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
