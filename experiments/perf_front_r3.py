"""Chip measurement of the fused FRONT decode kernel + bulk production A/B.

The full fused kernel is compile-infeasible (conv1..3 tap slices SIGKILL
the Mosaic compile helper — experiments/fused_bisect4_r3.py); the front
half (LN -> Conv_0 phases -> GN0 -> quant -> int8 resize) compiles in
~46 s and replaces the stages the in-bulk ablation budgeted at ~9.4
us/shower (MLP+LN 1.35 + conv0+gn0 8.05). Stage 1 times the decode
in-jit (x50) for int8_backend in {xla, fused_front}; stage 2 runs the
production bulk ladder with precision="int8_fused_front" vs "int8".

Usage: perf_front_r3.py [stage1|bulk|all] [tb ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

ITERS = 50


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    tbs = [int(a) for a in sys.argv[2:]] or [4, 8]

    from zdcsim.models import proton_fast as pf
    from zdcsim.models.proton import Generator
    from zdcsim.ops import pallas_decode_fused as pdf

    key = jax.random.PRNGKey(0)
    B = 64
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)["params"],
    )

    def rep(op):
        def run(z, c):
            def body(carry, _):
                y = op(carry, c)
                s = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(carry.dtype)
                return carry + s, None

            zf, _ = lax.scan(body, z, None, length=ITERS)
            return jnp.sum(zf.astype(jnp.float32))

        return jax.jit(run)

    def t(name, fn, *args):
        out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        float(fn(*args))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:30s}: {dt*1e6:9.1f} us/op  ({dt*1e6/B:6.2f} us/sample)",
              flush=True)
        return dt * 1e6 / B

    if mode in ("stage1", "all"):
        xla_us = t("decode int8 XLA (B=64)", rep(
            lambda z, c: pf.fast_generator_apply(params, z, c, int8=True)),
            noise, cond)
        best = float("inf")
        for tb in tbs:
            t0c = time.perf_counter()
            try:
                pdf.FUSED_BLOCK_ROWS = tb
                us = t(f"decode fused_front tb={tb}", rep(
                    lambda z, c: pf.fast_generator_apply(
                        params, z, c, int8=True, int8_backend="fused_front")),
                    noise, cond)
                print(f"  (compile+run wall {time.perf_counter()-t0c:.0f}s)",
                      flush=True)
                best = min(best, us)
            except Exception as e:  # noqa: BLE001 — ladder past Mosaic failures
                print(f"fused_front tb={tb} FAILED after "
                      f"{time.perf_counter()-t0c:.0f}s: {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        if mode == "all" and best >= xla_us:
            print(f"verdict: fused_front best {best:.2f} us/sample does not "
                  f"beat XLA {xla_us:.2f} — skipping bulk", flush=True)
            return

    if mode in ("bulk", "all"):
        from zdcsim.config import load_config
        from zdcsim.inference import FastSim
        from zdcsim.models import build_moe
        from zdcsim.train.state import init_state_jit

        cfg3 = load_config(overrides=["model.n_experts=3"])
        modules3 = build_moe(cfg3)
        state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))

        for prec, tile, tb in [("int8_fused_front", 64, tbs[0]),
                               ("int8_fused_front", 128, tbs[0]),
                               ("int8", 64, 0)]:
            try:
                if tb:
                    pdf.FUSED_BLOCK_ROWS = tb
                eng = FastSim.from_state(
                    modules3, state3, use_ema=False, batch_size=32768,
                    precision=prec)
                eng._build_switch(tile=tile)
                stats = eng.throughput_bulk(n_showers=131072)
                sps = stats["showers_per_sec"]
                print(f"bulk {prec:16s} T={tile:3d} tb={tb}: {sps:10,.0f} "
                      f"showers/s ({1e6/sps:6.2f} us/shower)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bulk {prec} T={tile} tb={tb} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
