"""Structural bisect of the fused-decode pallas_call Mosaic SIGABRT.

fused_bisect_r3 showed even debug_stop_stage=1 (LN+quant+write only)
crashes the TPU compile helper, while kernel A (same LN math, simple
2D call) compiles fine. So the crash is in the CALL STRUCTURE: block
specs, scratch shapes, out spec, or constants. This builds pallas_calls
with a trivial body and adds one structural element at a time.
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
from zdcsim.ops.pallas_decode_fused import (  # noqa: E402
    C0, C1, C2, C3, H0, W0, HG, WG, _PAD0, _PADG,
)

B, TB = 64, 8
M0 = TB * H0 * W0
MG = TB * HG * WG


def const(*dims):
    return pl.BlockSpec(dims, lambda i: (0,) * len(dims),
                        memory_space=pltpu.VMEM)


def try_case(name, in_specs, args, scratch_shapes, out3d=True, body=None):
    if out3d:
        out_spec = pl.BlockSpec((TB, HG, WG), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, HG, WG), jnp.float32)
    else:
        out_spec = pl.BlockSpec((TB, HG * WG), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, HG * WG), jnp.float32)

    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[len(in_specs)]
        s = jnp.sum(x_ref[:].astype(jnp.float32))
        if body is not None:
            s = s + body(refs, len(in_specs))
        if out3d:
            out_ref[:] = jnp.full((TB, HG, WG), s, jnp.float32)
        else:
            out_ref[:] = jnp.full((TB, HG * WG), s, jnp.float32)

    t0 = time.perf_counter()
    try:
        fn = pl.pallas_call(
            kernel, grid=(B // TB,), in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape, scratch_shapes=scratch_shapes,
            interpret=False, compiler_params=_COMPILER_PARAMS,
        )
        out = jax.jit(fn)(*args)
        val = float(jnp.sum(out))
        print(f"{name:44s}: OK ({time.perf_counter()-t0:5.1f}s, {val:.2e})",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s}: FAILED ({time.perf_counter()-t0:5.1f}s) "
              f"{type(e).__name__}: {str(e)[:150]}", flush=True)
        return False


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)

    x3 = jnp.ones((B, H0 * W0, C0), jnp.float32)
    xspec = pl.BlockSpec((TB, H0 * W0, C0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    # 1. minimal: 3D in block + 3D out block
    try_case("x3d -> out3d", [xspec], [x3], [])
    # 2. same but 2D out
    try_case("x3d -> out2d", [xspec], [x3], [], out3d=False)
    # 3. + the two LN const blocks (1, 180, 512)
    ln = jnp.ones((1, H0 * W0, C0), jnp.float32)
    try_case("+ ln consts", [xspec, const(1, H0 * W0, C0),
                             const(1, H0 * W0, C0)], [x3, ln, ln], [])
    # 4. + int8 weight consts
    k0 = jnp.ones((25, C0, C1), jnp.int8)
    try_case("+ k0 int8 (25,512,256)", [xspec, const(25, C0, C1)],
             [x3, k0], [])
    # 5. scratch: int8 halo buffers one at a time
    try_case("+ scratch xpad0 i8", [xspec], [x3],
             [pltpu.VMEM((M0 + 2 * _PAD0, C0), jnp.int8)])
    try_case("+ scratch xpadg i8", [xspec], [x3],
             [pltpu.VMEM((MG + 2 * _PADG, C1), jnp.int8)])
    try_case("+ scratch y1q i8", [xspec], [x3],
             [pltpu.VMEM((MG + 2 * _PADG, C2), jnp.int8)])
    try_case("+ scratch y2q f32", [xspec], [x3],
             [pltpu.VMEM((MG + 2 * _PADG, C3), jnp.float32)])
    # 6. all four scratch
    try_case("+ all scratch", [xspec], [x3], [
        pltpu.VMEM((M0 + 2 * _PAD0, C0), jnp.int8),
        pltpu.VMEM((MG + 2 * _PADG, C1), jnp.int8),
        pltpu.VMEM((MG + 2 * _PADG, C2), jnp.int8),
        pltpu.VMEM((MG + 2 * _PADG, C3), jnp.float32),
    ])
    # 7. scratch + a store/load through it
    def use_scratch(refs, n_in):
        xpad = refs[n_in + 1]
        xpad[_PAD0:_PAD0 + M0, :] = jnp.zeros((M0, C0), jnp.int8)
        return jnp.sum(xpad[_PAD0:_PAD0 + M0, :].astype(jnp.float32))

    try_case("+ xpad0 store/load", [xspec], [x3],
             [pltpu.VMEM((M0 + 2 * _PAD0, C0), jnp.int8)], body=use_scratch)
    # 8. shifted (unaligned) load from int8 scratch
    def shifted_load(refs, n_in):
        xpad = refs[n_in + 1]
        xpad[_PAD0:_PAD0 + M0, :] = jnp.zeros((M0, C0), jnp.int8)
        return jnp.sum(xpad[_PAD0 + 3:_PAD0 + 3 + M0, :].astype(jnp.float32))

    try_case("+ xpad0 shifted load", [xspec], [x3],
             [pltpu.VMEM((M0 + 2 * _PAD0, C0), jnp.int8)], body=shifted_load)


if __name__ == "__main__":
    main()
