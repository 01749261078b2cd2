"""In-context decode cost breakdown + bulk tile ladder (round 3).

perf_serve_r3/r3b measured: Pallas conv0 wins 1.8x op-level (40.5 vs
73.6 ms at B=4096) but the decode-level swap recovers only 7 ms of the
33 ms (116 vs 123) and LOSES in bulk at tile=64 (34.4k vs 39.7k). This
harness localizes where the 123 ms decode actually goes (cumulative-stage
in-jit timings) and how bulk throughput responds to tile size for both
backends — the two facts needed to pick the next (final) serving lever.

All numbers in-jit x8 with a scalar feedback carry (RTT-poisoned
otherwise, CLAUDE.md).
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
    from zdcsim.models import proton_fast as pf
    from zdcsim.train.state import init_state_jit

    key = jax.random.PRNGKey(0)
    B = 4096

    cfg = load_config(overrides=["model.n_experts=1"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(
        lambda v: v[0].astype(jnp.bfloat16)
        if jnp.issubdtype(v.dtype, jnp.floating) else v[0],
        state.gen.params,
    )
    noise = jax.random.normal(key, (B, 10), jnp.bfloat16)
    cond = jax.random.normal(key, (B, 9), jnp.bfloat16)

    bp0, bp1 = p["MLPBlock_0"], p["MLPBlock_1"]

    def mlp(nz):
        x = jnp.concatenate([nz, cond], axis=1)
        x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
        x = pf._leaky(pf._layer_norm(x, bp0["LayerNorm_0"]))
        x = x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]
        x = pf._leaky(pf._layer_norm(x, bp1["LayerNorm_0"]))
        return x.reshape(-1, 18, 10, 512)

    def conv0_x(nz):
        return pf.fused_upsample2_conv4_int8(
            mlp(nz), p["Conv_0"]["kernel"], p["Conv_0"]["bias"])

    def conv0_p(nz):
        from zdcsim.ops.pallas_decode import ln_leaky_rowquant, up2_conv4_int8
        x = jnp.concatenate([nz, cond], axis=1)
        x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
        x = pf._leaky(pf._layer_norm(x, bp0["LayerNorm_0"]))
        x = x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]
        xq, sx = ln_leaky_rowquant(
            x, bp1["LayerNorm_0"]["scale"], bp1["LayerNorm_0"]["bias"])
        return up2_conv4_int8(
            xq.reshape(-1, 18, 10, 512), sx,
            p["Conv_0"]["kernel"], p["Conv_0"]["bias"], out_dtype=jnp.bfloat16)

    def thru_conv1(conv0):
        def f(nz):
            x = conv0(nz)
            x = pf._leaky(pf._group_norm(x, p["GroupNorm2d_0"]["GroupNorm_0"], 256))
            return pf.fused_row_resize_conv4_int8(
                x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
        return f

    def tail(conv0):
        def f(nz):
            x = thru_conv1(conv0)(nz)
            x = pf._leaky(pf._group_norm(x, p["GroupNorm2d_1"]["GroupNorm_0"], 128))
            x = pf._conv(x, p["Conv_2"]["kernel"], ((1, 1), (1, 1))) + p["Conv_2"]["bias"]
            x = pf._leaky(pf._group_norm(x, p["GroupNorm2d_2"]["GroupNorm_0"], 64))
            x = pf._conv(x, p["Conv_3"]["kernel"], ((1, 1), (1, 1))) + p["Conv_3"]["bias"]
            return jax.nn.relu(x)
        return f

    print(f"\n--- cumulative decode stages at B={B} (in-jit x8) ---", flush=True)
    timeit(rep(mlp), noise, "mlp (2 dense + 2 LN)")
    timeit(rep(conv0_x), noise, "mlp + conv0 XLA int8")
    timeit(rep(conv0_p), noise, "mlp + conv0 PALLAS (A+B)")
    timeit(rep(thru_conv1(conv0_x)), noise, "... + gn0 + conv1 XLA int8")
    timeit(rep(thru_conv1(conv0_p)), noise, "... + gn0 + conv1 (conv0=pallas)")
    timeit(rep(tail(conv0_x)), noise, "full decode XLA")
    timeit(rep(tail(conv0_p)), noise, "full decode (conv0=pallas)")

    print("\n--- bulk tile/batch ladder (n=131072) ---", flush=True)
    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    for prec, batch, tile in (
        ("int8", 32768, 128),
        ("int8", 32768, 256),
        ("int8", 65536, 64),
        ("int8_pallas_ab", 32768, 256),
        ("int8_pallas_ab", 32768, 1024),
    ):
        try:
            eng = FastSim.from_state(
                modules3, state3, use_ema=False, batch_size=batch, precision=prec)
            eng._build_switch(tile=tile)
            stats = eng.throughput_bulk(n_showers=131072)
            print(f"{prec:16s} B={batch:6d} T={tile:5d}: "
                  f"{stats['showers_per_sec']:,.0f} showers/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{prec:16s} B={batch:6d} T={tile:5d}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
