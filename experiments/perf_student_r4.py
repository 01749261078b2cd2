"""Student-serving tile/batch ladder (follow-up to distill_r4: the w=0.5
student passed the fidelity gate at 1.432x floor and measured 85.1k (T=64)
/ 95.1k (T=128) showers/s — re-ladder the tile/batch around the new
optimum; the 4x-smaller convs move the VMEM/overhead balance).

Usage: python experiments/perf_student_r4.py [width]
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

    width = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    cfg = load_config(overrides=[
        "model.n_experts=3", f"model.generator.width={width}",
    ])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))

    for batch, tile in [(32768, 128), (32768, 256), (32768, 512),
                        (65536, 128), (65536, 256)]:
        try:
            eng = FastSim.from_state(
                modules, state, use_ema=False, batch_size=batch,
                precision="int8",
            )
            eng._build_switch(tile=tile)
            stats = eng.throughput_bulk(n_showers=262144)
            sps = stats["showers_per_sec"]
            print(f"student w={width} bulk int8 B={batch} T={tile:3d}: "
                  f"{sps:10,.0f} showers/s ({1e6/sps:6.2f} us/shower)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={batch} T={tile} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
