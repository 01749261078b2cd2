"""Round 2 of the Mosaic op bisect: which rank>=3 patterns survive?

fused_bisect3 showed multi-axis partial reductions on rank>=3 crash the
compile helper (SIGABRT), while 2D reshape + axis-1 reductions are fine.
The fused-kernel rewrite needs to know which of the remaining rank>=3
patterns are safe: single-axis reductions, reshape merges, broadcasts,
stacks/interleaves (int8), and the 5D row-resize stack.
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

B, TB = 64, 8
H, W, C = 35, 19, 256
HG, WG = 56, 30


def try_case(name, body):
    xspec = pl.BlockSpec((TB, H * W, C), lambda i: (i, 0, 0),
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
        out = jax.jit(fn)(jnp.ones((B, H * W, C), jnp.float32))
        val = float(jnp.sum(out))
        print(f"{name:44s}: OK ({time.perf_counter()-t0:5.1f}s, {val:.2e})",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s}: FAILED ({time.perf_counter()-t0:5.1f}s) "
              f"{type(e).__name__}: {str(e)[:150]}", flush=True)


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    f32sum = lambda v: jnp.sum(v.astype(jnp.float32).reshape(TB, -1), axis=1)  # noqa: E731

    # 3D single-axis reductions
    try_case("3D sum axis=1 (keep b,c)",
             lambda x: jnp.sum(jnp.sum(x, axis=1), axis=1))
    try_case("3D sum axis=2 (keep b,p)",
             lambda x: jnp.sum(jnp.sum(x, axis=2), axis=1))
    try_case("3D max axis=1",
             lambda x: jnp.max(jnp.max(jnp.abs(x), axis=1), axis=1))
    # 4D <-> 3D reshapes
    try_case("reshape 3D->4D->3D merge hw",
             lambda x: f32sum(x.reshape(TB, H, W, C).reshape(TB, H * W, C)))
    try_case("4D slice rows + merge",
             lambda x: f32sum(x.reshape(TB, H, W, C)[:, :18].reshape(
                 TB, 18 * W, C)))
    # broadcasts on 4D
    try_case("4D bcast (tb,1,1,C) mul",
             lambda x: f32sum(x.reshape(TB, H, W, C)
                              * jnp.ones((TB, 1, 1, C), jnp.float32)))
    # int8 stack / interleave patterns
    try_case("int8 4D stack ax2 + reshape",
             lambda x: _stack_interleave(x))
    try_case("int8 col stack (30 slices)",
             lambda x: _col_stack(x))
    try_case("5D row-phase stack + reshape",
             lambda x: _row_resize(x))
    # 2D dot on int8 (control, kernel-B pattern)
    try_case("int8 2D dot [m,C]@[C,128]",
             lambda x: _int8_dot(x))
    # matmul group-stats replacement pattern: [tb*P,C]@[C,G]
    try_case("gn stats via 2D dot + 3D ax1 sum",
             lambda x: _gn_stats(x))


def _stack_interleave(x):
    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8).reshape(TB, H, W, C)
    even, odd = q[:, :, :10, :], q[:, :, :9, :]
    pad = [(0, 0)] * 4
    pad[2] = (0, 1)
    st = jnp.stack([even, jnp.pad(odd, pad)], axis=3)  # [TB,H,10,2,C]
    out = st.reshape(TB, H, 20, C)[:, :, :19, :]
    return jnp.sum(out.astype(jnp.float32).reshape(TB, -1), axis=1)


def _col_stack(x):
    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8).reshape(TB, H, W, C)
    cols = [q[:, :, (j * W) // WG, :] for j in range(WG)]
    qc = jnp.stack(cols, axis=2)  # [TB, H, 30, C]
    return jnp.sum(qc.astype(jnp.float32).reshape(TB, -1), axis=1)


def _row_resize(x):
    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8).reshape(TB, H, W, C)
    qc = jnp.stack([q[:, :, (j * W) // WG, :] for j in range(WG)], axis=2)
    qg = qc.reshape(TB, 7, 5, WG, C)
    pat = [0, 1, 1, 2, 3, 3, 4, 4]
    rp = jnp.stack([qg[:, :, pat[k], :, :] for k in range(8)], axis=2)
    xr = rp.reshape(TB, HG, WG, C)
    return jnp.sum(xr.astype(jnp.float32).reshape(TB, -1), axis=1)


def _int8_dot(x):
    q = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8).reshape(
        TB * H * W, C)
    k = jnp.ones((C, 128), jnp.int8)
    acc = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return jnp.sum(acc.astype(jnp.float32).reshape(TB, -1), axis=1)


def _gn_stats(x):
    gmat = jnp.asarray(
        (jnp.arange(C)[:, None] // (C // 32)) == jnp.arange(32)[None, :],
        jnp.float32)
    t = jax.lax.dot_general(
        x.reshape(TB * H * W, C), gmat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TB*P, 32]
    s1 = jnp.sum(t.reshape(TB, H * W, 32), axis=1)  # 3D ax1 -> [TB, 32]
    return jnp.sum(s1, axis=1)


if __name__ == "__main__":
    main()
