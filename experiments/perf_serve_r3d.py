"""Decompose the round-3 decode levers (bulk regressed 40k -> 36.6k).

perf_serve_r3c measured bulk int8 at 36.4-36.8k with BOTH new levers on
(bf16 dequant + int8 Conv_2) vs 39.7-40.4k before either — decode-level
neutral, bulk-level negative. This A/Bs each lever independently via the
proton_fast module toggles, bulk config B=32768 T=64 n=131072.
"""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "/root/repo")


def main():
    print("devices:", jax.devices(), flush=True)
    import jax.numpy as jnp

    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.models import proton_fast as pf
    from zdcsim.train.state import init_state_jit

    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))

    arms = (
        ("r2 baseline (f32 dq, bf16 conv2)", jnp.float32, False),
        ("bf16 dequant only", None, False),
        ("int8 conv2 only", jnp.float32, True),
        ("both (r3c default)", None, True),
    )
    for name, dq, c2 in arms:
        pf.DEQUANT_DTYPE = dq
        pf.INT8_CONV2 = c2
        eng = FastSim.from_state(
            modules3, state3, use_ema=False, batch_size=32768, precision="int8")
        eng._build_switch(tile=64)
        stats = eng.throughput_bulk(n_showers=131072)
        print(f"{name:36s}: {stats['showers_per_sec']:,.0f} showers/s", flush=True)


if __name__ == "__main__":
    main()
