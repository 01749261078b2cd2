"""Student serving precision A/B at small widths (int8 vs bf16).

The w=0.125 leaf-op budget (experiments/profile_student_r4.py +
xplane_parse.py) shows ~43% of per-tile branch time is int8 DYNAMIC
QUANTIZATION machinery (per-tile activation amax reductions, s8 casts, s8
layout copies/transposes) and only ~35% is the convolutions themselves —
at the width floor the convs are too small to amortize the quant ops that
paid off at full width (round-3 "bf16 dequant -11%" was measured at w=1).
This ladder re-runs the precision choice per width.

Usage: python experiments/perf_student2_r4.py [widths...] (default .125 .25)
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

    widths = [float(a) for a in sys.argv[1:]] or [0.125, 0.25]
    for width in widths:
        cfg = load_config(overrides=[
            "model.n_experts=3", f"model.generator.width={width}",
        ])
        modules = build_moe(cfg)
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
        for precision in ("int8", "bf16"):
            for tile in (128, 256):
                try:
                    eng = FastSim.from_state(
                        modules, state, use_ema=False, batch_size=32768,
                        precision=precision,
                    )
                    eng._build_switch(tile=tile)
                    stats = eng.throughput_bulk(n_showers=262144)
                    sps = stats["showers_per_sec"]
                    print(f"w={width} {precision:5s} T={tile:3d}: "
                          f"{sps:10,.0f} showers/s "
                          f"({1e6/sps:6.2f} us/shower)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"w={width} {precision} T={tile} FAILED: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
