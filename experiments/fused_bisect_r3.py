"""Bisect the Mosaic SIGABRT in the fused decode kernel on chip.

After the strided-slice->gather fix, the fused kernel no longer hits the
"Only 2D gather" NotImplementedError but the TPU compile helper SIGABRTs
(a Mosaic CHECK crash, no diagnostics). This compiles the kernel with
``debug_stop_stage=N`` for N=1..9 then the full kernel, in order, and
reports the first stage that crashes the compiler. Stages:

 1 LN+leaky+quant          6 row resize + xpadg store
 2 conv0 parity phases     7 conv1 (16-tap int8)
 3 GN0 + per-phase quant   8 GN1 + rowquant + y1q store
 4 parity interleave q1    9 conv2 + GN2 + y2q store
 5 column resize stack    10 conv3 + out (full kernel)
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

    key = jax.random.PRNGKey(0)
    B = 64
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10), jnp.bfloat16)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)["params"],
    )
    x = jax.random.normal(jax.random.PRNGKey(7), (B, 92160), jnp.float32)

    tb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    stages = [
        None if s in ("None", "full", "0") else int(s)
        for s in sys.argv[2].split(",")
    ] if len(sys.argv) > 2 else [*range(1, 10), None]
    for stage in stages:
        t0 = time.perf_counter()
        try:
            out = fused_decode_from_params(
                params, x, block_rows=tb, debug_stop_stage=stage)
            val = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            print(f"stage {stage}: OK ({dt:.1f}s, sum={val:.3e})", flush=True)
        except Exception as e:  # noqa: BLE001 — keep bisecting past crashes
            dt = time.perf_counter() - t0
            print(f"stage {stage}: FAILED ({dt:.1f}s) {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
