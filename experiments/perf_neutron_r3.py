"""Neutron serving throughput on chip (round 3).

Measures the neutron family's bulk tiled-switch serving at E=3 across
the new fast path (BatchNorm folding, zdcsim/models/neutron_fast.py):
module path (fast=False) vs folded bf16 vs folded int8, plus a tile
re-ladder — the neutron decode (44x44, ~0.9 GMAC/sample) has a different
VMEM picture than the proton 56x30.
"""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "/root/repo")


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    cfg = load_config(overrides=[
        "model.architecture=neutron", "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44, 44]", "model.n_experts=3",
        "model.norm=batch",
    ])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))

    runs = [
        ("bf16", False, 64), ("bf16", True, 64),
        ("int8", True, 64), ("int8", True, 32), ("int8", True, 128),
    ]
    for precision, fast, tile in runs:
        try:
            eng = FastSim.from_state(
                modules, state, use_ema=False, batch_size=16384,
                precision=precision, fast=fast,
            )
            eng._build_switch(tile=tile)
            stats = eng.throughput_bulk(n_showers=65536)
            sps = stats["showers_per_sec"]
            print(f"neutron bulk {precision} fast={fast} T={tile:3d}: "
                  f"{sps:10,.0f} showers/s ({1e6/sps:6.2f} us/shower)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"neutron {precision} fast={fast} T={tile} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
