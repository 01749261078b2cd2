"""Body-op bisect of the fused-decode Mosaic SIGABRT (stage-1 math).

fused_bisect2 cleared the call structure; stage 1 still crashes, so
one of its ops on the 3D [TB, 180, 512] block is the killer:
multi-axis reductions, broadcasts, round/clip-to-int8, or the
flattening reshape in _dbg_out.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from zdcsim.ops.pallas_decode import _COMPILER_PARAMS  # noqa: E402
from zdcsim.ops.pallas_decode_fused import C0, H0, W0, HG, WG  # noqa: E402

B, TB = 64, 8


def try_case(name, body):
    xspec = pl.BlockSpec((TB, H0 * W0, C0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TB, HG, WG), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(x_ref, out_ref):
        s = body(x_ref[:])
        out_ref[:] = jnp.broadcast_to(
            s.reshape(TB, 1, 1).astype(jnp.float32), (TB, HG, WG))

    t0 = time.perf_counter()
    try:
        fn = pl.pallas_call(
            kernel, grid=(B // TB,), in_specs=[xspec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, HG, WG), jnp.float32),
            interpret=False, compiler_params=_COMPILER_PARAMS,
        )
        out = jax.jit(fn)(jnp.ones((B, H0 * W0, C0), jnp.float32))
        val = float(jnp.sum(out))
        print(f"{name:40s}: OK ({time.perf_counter()-t0:5.1f}s, {val:.2e})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s}: FAILED ({time.perf_counter()-t0:5.1f}s) "
              f"{type(e).__name__}: {str(e)[:150]}", flush=True)


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    try_case("sum axis=(1,2)", lambda x: jnp.sum(x, axis=(1, 2)))
    try_case("mean axis=(1,2) keepdims -> sub",
             lambda x: jnp.sum(x - jnp.mean(x, axis=(1, 2), keepdims=True),
                               axis=(1, 2)))
    try_case("full LN core", lambda x: _ln(x))
    try_case("max-abs axis=(1,2)",
             lambda x: jnp.max(jnp.abs(x), axis=(1, 2)))
    try_case("round/clip int8",
             lambda x: jnp.sum(
                 jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
                 .astype(jnp.float32), axis=(1, 2)))
    try_case("reshape (tb,-1) sum",
             lambda x: jnp.sum(x.reshape(TB, -1), axis=1))
    try_case("reshape (tb,H,W,C) sum",
             lambda x: jnp.sum(x.reshape(TB, H0, W0, C0), axis=(1, 2, 3)))
    try_case("reshape (m0, C) sum",
             lambda x: jnp.broadcast_to(
                 jnp.sum(x.reshape(TB * H0 * W0, C0)).reshape(1),
                 (TB,)))
    try_case("iota (m0,1) div/mod",
             lambda x: _iota_case(x))


def _ln(x):
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=(1, 2), keepdims=True)
    z = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    z = jnp.where(z >= 0, z, 0.1 * z)
    mx = jnp.max(jnp.abs(z), axis=(1, 2), keepdims=True)
    sx = jnp.maximum(mx / 127.0, 1e-12)
    q = jnp.clip(jnp.round(z / sx), -127, 127).astype(jnp.int8)
    return jnp.sum(q.astype(jnp.float32), axis=(1, 2))


def _iota_case(x):
    m0 = TB * H0 * W0
    midx = jax.lax.broadcasted_iota(jnp.int32, (m0, 1), 0)
    i0 = (midx // W0) % H0
    j0 = midx % W0
    ok = (i0 >= 0) & (j0 >= 0)
    return jnp.broadcast_to(
        jnp.sum(jnp.where(ok, x.reshape(m0, C0), 0.0)).reshape(1), (TB,))


if __name__ == "__main__":
    main()
