"""Compile-size bisect of the v2 (maskless padded-grid) fused decode.

tb=4 full-kernel compile SIGKILLed the remote compile helper after 490 s
(v1 tb=4 compiled and ran, so the explosion is a v2 construct). Probes
compile-only (no run) at ascending debug_stop_stage to find where the
Mosaic program blows up: stage 3 = per-phase GN0 (new in v2), stage 5 =
column gather, stage 6 = rank-5 row-phase stack + padded xpadg write
(new), stage 7 = conv1 16 maskless taps, full = everything.

Usage: python fused_bisect4_r3.py [tb] [stop ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    from zdcsim.models.proton import Generator
    from zdcsim.ops.pallas_decode_fused import fused_decode_from_params

    args = [int(a) for a in sys.argv[1:]]
    tb = args[0] if args else 4
    stops = args[1:] or [3, 6, 0]  # 0 = full kernel

    key = jax.random.PRNGKey(0)
    B = 64
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)["params"],
    )
    x1 = jnp.zeros((B, 92160), jnp.bfloat16)

    for stop in stops:
        t0 = time.perf_counter()
        try:
            fn = jax.jit(
                lambda x, s=(stop or None): fused_decode_from_params(
                    params, x, block_rows=tb, debug_stop_stage=s
                )
            )
            fn.lower(x1).compile()
            print(f"tb={tb} stop={stop or 'FULL'}: compiled in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — probe past failures
            print(f"tb={tb} stop={stop or 'FULL'}: FAILED after "
                  f"{time.perf_counter()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
