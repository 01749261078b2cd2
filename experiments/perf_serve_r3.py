"""Round-3 serving perf: Pallas int8 decode kernels vs the XLA int8 path.

All timings RTT-corrected (in-jit lax.scan repetition with a scalar feedback
dependency — see perf_study2_r2.py; per-call numbers over this tunnel carry
a ~26 ms dispatch floor and must not be trusted).

  1. Op-level: XLA LN+leaky+quant chain vs Pallas ln_leaky_rowquant;
     XLA int8 phase convs (+interleave) vs Pallas up2_conv4_int8.
  2. Decode-level: fast_generator_apply int8 xla vs pallas backends.
  3. Engine-level: bulk int8 vs bulk int8_pallas throughput at the bench
     config (B=32768, tile 64, n=131072).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

ITERS = 20


def rep_op(op, x0, iters=ITERS):
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
    from zdcsim.ops.pallas_decode import ln_leaky_rowquant, up2_conv4_int8
    from zdcsim.train.state import init_state_jit

    key = jax.random.PRNGKey(0)
    B = 4096
    F = 92160

    # ---- 1a. LN epilogue ----
    print(f"\n--- MLP LN epilogue at B={B} (per op, in-jit x{ITERS}) ---", flush=True)
    y = jax.random.normal(key, (B, F), jnp.bfloat16)
    scale = jnp.abs(jax.random.normal(key, (F,), jnp.float32)) + 0.5
    bias = jax.random.normal(key, (F,), jnp.float32) * 0.1

    def xla_chain(yy):
        mu = jnp.mean(yy, axis=-1, keepdims=True)
        var = jnp.var(yy, axis=-1, keepdims=True)
        z = (yy - mu) * lax.rsqrt(var + 1e-6) * scale + bias
        z = jnp.where(z >= 0, z, 0.1 * z)
        s = jnp.maximum(jnp.max(jnp.abs(z)) / 127.0, 1e-12)
        return jnp.clip(jnp.round(z / s), -127, 127).astype(jnp.int8)

    timeit(rep_op(xla_chain, y), y, name="LN+leaky+tensor-quant XLA", per=ITERS)
    timeit(
        rep_op(lambda yy: ln_leaky_rowquant(yy, scale, bias)[0], y), y,
        name="ln_leaky_rowquant PALLAS", per=ITERS,
    )

    # ---- 1b. conv0 ----
    print(f"\n--- conv0 (18x10x512 -> 35x19x256) at B={B} ---", flush=True)
    from zdcsim.models.proton_fast import fused_upsample2_conv4_int8

    xf32 = jax.random.normal(key, (B, 18, 10, 512), jnp.bfloat16)
    kern = jax.random.normal(key, (4, 4, 512, 256), jnp.float32) * 0.05
    cbias = jax.random.normal(key, (256,), jnp.float32) * 0.1
    xq = jax.random.randint(key, (B, 18, 10, 512), -127, 128, jnp.int8)
    sx = jnp.abs(jax.random.normal(key, (B,), jnp.float32)) * 0.01 + 1e-3

    timeit(
        rep_op(lambda xx: fused_upsample2_conv4_int8(xx, kern, cbias), xf32),
        xf32, name="conv0 XLA int8 phases (+quant+interleave)", per=ITERS,
    )

    def pallas_conv0(xqq):
        return up2_conv4_int8(xqq, sx, kern, cbias)

    # int8 feedback: keep scan dependency via int32 sum cast
    def rep_int8(op, iters=ITERS):
        def run(x):
            def body(c, _):
                out = op(c)
                s = (jnp.sum(out.astype(jnp.float32)) * 0).astype(jnp.int8)
                return c + s, None

            xf, _ = lax.scan(body, x, None, length=iters)
            return jnp.sum(xf.astype(jnp.int32))

        return jax.jit(run)

    timeit(rep_int8(pallas_conv0), xq, name="conv0 PALLAS int8 (fused dequant+ilv)", per=ITERS)

    # ---- 2. full decode ----
    print(f"\n--- full single-expert decode at B={B} ---", flush=True)
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

    for backend in ("xla", "pallas"):
        def dec(nz, be=backend):
            return fast_generator_apply(gp1, nz, cond, int8=True, int8_backend=be)

        timeit(rep_op(dec, noise, iters=8), noise, name=f"decode int8 {backend}", per=8)

    # ---- 3. engine throughput ----
    print("\n--- production bulk serving (B=32768 T=64 n=131072) ---", flush=True)
    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    for prec in ("int8", "int8_pallas"):
        eng = FastSim.from_state(
            modules3, state3, use_ema=False, batch_size=32768, precision=prec
        )
        eng._build_switch(tile=64)
        stats = eng.throughput_bulk(n_showers=131072)
        print(f"bulk {prec:12s}: {stats['showers_per_sec']:,.0f} showers/s", flush=True)


if __name__ == "__main__":
    main()
