"""Round-2 serving measurement: production engine paths on the real chip.

Measures (forced execution, one process):
  - per-call switch (round-1 bench config) as control
  - bulk scan serving, bf16, B=4096 and B=8192
  - bulk scan serving, int8, B=4096 and B=8192
"""

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

    def run(name, precision, batch, tile, bulk, n=65536):
        engine = FastSim.from_state(
            modules, state, use_ema=False, batch_size=batch, precision=precision
        )
        engine._build_switch(tile=tile)
        if bulk:
            stats = engine.throughput_bulk(n_showers=n)
        else:
            stats = engine.throughput_switch(n_batches=12, warmup=3)
        print(f"{name:44s} {stats['showers_per_sec']:>12,.0f} showers/s", flush=True)
        return stats["showers_per_sec"]

    run("per-call switch bf16 B=4096 T=64 (r1 cfg)", "bf16", 4096, 64, bulk=False)
    run("bulk bf16 B=4096 T=64", "bf16", 4096, 64, bulk=True)
    run("bulk bf16 B=8192 T=64", "bf16", 8192, 64, bulk=True)
    run("bulk int8 B=4096 T=64", "int8", 4096, 64, bulk=True)
    run("bulk int8 B=8192 T=64", "int8", 8192, 64, bulk=True)
    run("bulk int8 B=8192 T=128", "int8", 8192, 128, bulk=True)


if __name__ == "__main__":
    main()
