"""In-bulk A/B of naive vs phase-decomposed int8 conv formulations.

perf_mm_r3.py measured (tile B=64, real chip) the folded row-phase Conv_1
at 11.4% int8-MXU utilization vs 35.6% for one plain conv on the
materialized int8 resized grid — 2.3x faster despite 1.38x more MACs.
This harness checks whether that op-level win survives the production
bulk tiled-switch context (every round-2/3 decode-level lever so far
transferred poorly), and re-ladders the tile for the winner (the naive
forms materialize bigger int8 intermediates -> different VMEM footprint).

Arms: baseline (phase/folded) | conv1 naive | conv0 naive | both naive,
then tile 32/128 for the best config. Bulk int8, B=32768, n=131072.
"""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "/root/repo")


def main():
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.models import proton_fast as pf
    from zdcsim.train.state import init_state_jit

    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))

    arms = [
        ("baseline phase/folded T=64", "phase", "folded", 64),
        ("conv1 naive           T=64", "phase", "naive", 64),
        ("conv0 naive           T=64", "naive", "folded", 64),
        ("both naive            T=64", "naive", "naive", 64),
        ("conv1 naive           T=32", "phase", "naive", 32),
        ("conv1 naive           T=128", "phase", "naive", 128),
    ]
    try:
        for name, c0, c1, tile in arms:
            pf.INT8_CONV0_IMPL = c0
            pf.INT8_CONV1_IMPL = c1
            eng = FastSim.from_state(
                modules3, state3, use_ema=False, batch_size=32768, precision="int8")
            eng._build_switch(tile=tile)
            stats = eng.throughput_bulk(n_showers=131072)
            sps = stats["showers_per_sec"]
            print(f"{name}: {sps:10,.0f} showers/s  ({1e6/sps:6.2f} us/shower)",
                  flush=True)
    finally:
        pf.INT8_CONV0_IMPL = "phase"
        pf.INT8_CONV1_IMPL = "folded"


if __name__ == "__main__":
    main()
