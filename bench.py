#!/usr/bin/env python
"""Fast-sim throughput benchmark.

Prints ONE JSON line:
``{"metric": "fastsim_throughput", "value": N, "unit": "showers/sec/chip",
"vs_baseline": N/50000}``.

Baseline: BASELINE.json north star (>= 50,000 generated showers/sec/chip on
TPU; the reference publishes no numbers of its own — BASELINE.md).
The benchmark runs the compiled serving path (router -> all-expert decode ->
routed gather -> expm1) on the flagship proton MoE (3 experts) in bfloat16.
"""

from __future__ import annotations

import json
import sys

BASELINE_SHOWERS_PER_SEC = 50_000.0


def main() -> int:
    import jax

    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    cfg = load_config(overrides=["model.n_experts=3"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))

    # Primary path: on-device tiled-switch dispatch at B=4096/tile=64 —
    # best measured config (24.5k showers/s vs 6.6k dense on v5e; see
    # zdcsim/inference/switch_dispatch.py). Falls back to dense decode at
    # B=1024 (the dense memory sweet spot: 8192 OOMs 16 GB HBM).
    try:
        engine = FastSim.from_state(
            modules, state, use_ema=False, batch_size=4096, precision="bf16"
        )
        engine._build_switch(tile=64)
        stats = engine.throughput_switch(n_batches=12, warmup=3)
    except Exception as e:  # noqa: BLE001 — bench must always print a number
        print(f"switch-dispatch bench failed ({type(e).__name__}); dense fallback",
              file=sys.stderr)
        engine = FastSim.from_state(
            modules, state, use_ema=False, batch_size=1024, precision="bf16"
        )
        stats = engine.throughput(n_batches=20, warmup=4)
    value = stats["showers_per_sec"]
    print(
        json.dumps(
            {
                "metric": "fastsim_throughput",
                "value": round(value, 1),
                "unit": "showers/sec/chip",
                "vs_baseline": round(value / BASELINE_SHOWERS_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
