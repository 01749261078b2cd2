"""Chip measurement of the v2 (maskless padded-grid) fused decode kernel.

v1 (per-tap iota masks) measured 49.2 us/sample at tb=4 — 2x slower than
the XLA int8 path (24.6) — and tb=8 killed the remote compile helper;
the cost model blamed ~40M VPU select-elements per block (BENCH_LOG).
v2 eliminates every tap mask. Stage 1 times the standalone decode
in-jit (x50) vs the XLA int8 decode; stage 2 (bulk production ladder)
runs ONLY if stage 1 beats XLA — each bulk compile costs minutes over
the tunnel.
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
    from zdcsim.models.proton import Generator
    from zdcsim.models import proton_fast as pf
    from zdcsim.ops.pallas_decode_fused import fused_decode_from_params

    key = jax.random.PRNGKey(0)
    B = 64
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)["params"],
    )

    def dense1(z, c):
        x = jnp.concatenate([z, c], axis=1)
        bp0 = params["MLPBlock_0"]
        x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
        x = pf._leaky(pf._layer_norm(x, bp0["LayerNorm_0"]))
        bp1 = params["MLPBlock_1"]
        return x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]

    x1 = jax.jit(dense1)(noise, cond)

    def rep(op):
        def run(x):
            def body(c, _):
                y = op(c)
                s = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(c.dtype)
                return c + s, None

            xf, _ = lax.scan(body, x, None, length=ITERS)
            return jnp.sum(xf.astype(jnp.float32))

        return jax.jit(run)

    best = {"us": float("inf"), "tb": None}

    def t(name, fn, *args, track_tb=None):
        out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        float(fn(*args))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:26s}: {dt*1e6:9.1f} us/op  ({dt*1e6/B:6.2f} us/sample)",
              flush=True)
        if track_tb is not None and dt * 1e6 / B < best["us"]:
            best.update(us=dt * 1e6 / B, tb=track_tb)
        return dt * 1e6 / B

    # tb=4 first: v1's tb=8 killed the remote compile helper and v2's
    # tb=8 hung >25 min on chip — big blocks go LAST so a pathological
    # Mosaic compile can't starve the whole ladder.
    tbs = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    for tb in tbs:
        t0c = time.perf_counter()
        try:
            t(f"fused v2 (B=64, tb={tb})",
              rep(lambda x, tb=tb: fused_decode_from_params(
                  params, x, block_rows=tb)), x1, track_tb=tb)
            print(f"  (compile+run wall {time.perf_counter()-t0c:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — ladder past Mosaic failures
            print(f"fused tb={tb} FAILED after {time.perf_counter()-t0c:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    # Gate on the XLA baseline measured IN THIS RUN (ADVICE r3: a future
    # Mosaic re-probe must not compare against a stale session's number).
    xla_us = t("XLA int8 post-MLP (B=64)", rep(
        lambda x: _xla_tail(pf, params, x)), x1)
    print(f"  (round-3 session reference for this line: 24.60 us/sample)",
          flush=True)
    if best["us"] >= xla_us:
        print(f"stage1 verdict: fused v2 best {best['us']:.2f} us/sample does "
              f"not beat XLA {xla_us:.2f} — skipping bulk", flush=True)
        return
    print(f"stage1 verdict: fused v2 wins ({best['us']:.2f} vs {xla_us:.2f} "
          f"us/sample at tb={best['tb']}) — running bulk ladder", flush=True)

    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit
    from zdcsim.ops import pallas_decode_fused as pdf

    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))

    tbb = best["tb"]
    for prec, tile, tb in [("int8_fused", 64, tbb), ("int8_fused", 128, tbb),
                           ("int8_fused", 256, tbb)]:
        try:
            pdf.FUSED_BLOCK_ROWS = tb
            eng = FastSim.from_state(
                modules3, state3, use_ema=False, batch_size=32768,
                precision=prec)
            eng._build_switch(tile=tile)
            stats = eng.throughput_bulk(n_showers=131072)
            sps = stats["showers_per_sec"]
            print(f"bulk {prec:11s} T={tile:3d} tb={tb}: {sps:10,.0f} showers/s "
                  f"({1e6/sps:6.2f} us/shower)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bulk {prec} T={tile} tb={tb} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def _xla_tail(pf, params, x):
    """The XLA int8 decode from Dense_1 output (mirrors fast_generator_apply
    past the MLP, production int8 path — Conv_1 via the NAIVE
    materialized-resize form, INT8_CONV1_IMPL='naive', the measured-faster
    production default; ADVICE r3 flagged the folded form here as a
    baseline that flattered the fused kernel)."""
    import jax.numpy as jnp

    p = params
    bp1 = p["MLPBlock_1"]
    h = pf._leaky(pf._layer_norm(x, bp1["LayerNorm_0"]))
    h = h.reshape(-1, 18, 10, 512)
    h = pf.fused_upsample2_conv4_int8(h, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    h = pf._leaky(pf._group_norm(h, p["GroupNorm2d_0"]["GroupNorm_0"], 256))
    h = pf.resize_conv4_int8_naive(h, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
    h = pf._leaky(pf._group_norm(h, p["GroupNorm2d_1"]["GroupNorm_0"], 128))
    h = pf.conv3x3_int8(h, p["Conv_2"]["kernel"], p["Conv_2"]["bias"])
    h = pf._leaky(pf._group_norm(h, p["GroupNorm2d_2"]["GroupNorm_0"], 64))
    h = pf._conv(h, p["Conv_3"]["kernel"], ((1, 1), (1, 1))) + p["Conv_3"]["bias"]
    return jax.nn.relu(h)


if __name__ == "__main__":
    main()
