"""Bulk int8 serving config sweep: batch size x workload size x tile."""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "/root/repo")

from zdcsim.config import load_config  # noqa: E402
from zdcsim.inference import FastSim  # noqa: E402
from zdcsim.models import build_moe  # noqa: E402
from zdcsim.train.state import init_state_jit  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = load_config(overrides=["model.n_experts=3"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))

    for batch, tile, n in (
        (8192, 64, 131072),
        (16384, 64, 131072),
        (16384, 32, 131072),
        (32768, 64, 131072),
    ):
        try:
            engine = FastSim.from_state(
                modules, state, use_ema=False, batch_size=batch, precision="int8"
            )
            engine._build_switch(tile=tile)
            stats = engine.throughput_bulk(n_showers=n)
            print(f"bulk int8 B={batch} T={tile} n={n}: "
                  f"{stats['showers_per_sec']:>10,.0f} showers/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bulk int8 B={batch} T={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
