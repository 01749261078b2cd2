"""Static vs dynamic int8 activation scales — bulk serving A/B.

The w=0.125 per-tile branch budget (profile_student_r4.py) shows ~43% of
branch time in int8 quantize/scale ops; the dynamic per-tensor max forces
a materialize->reduce->re-read round-trip per quant site per tile. With a
static calibrated scale (FastSim(static_act_quant=True)) the quantize is
pure elementwise and fuses into the preceding norm epilogue.

Usage: python experiments/perf_staticq_r4.py [widths...] (default .125 .25 1)
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

    widths = [float(a) for a in sys.argv[1:]] or [0.125, 0.25, 1.0]
    for width in widths:
        cfg = load_config(overrides=[
            "model.n_experts=3", f"model.generator.width={width}",
        ])
        modules = build_moe(cfg)
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
        for static in (False, True):
            for tile in (128, 256):
                try:
                    eng = FastSim.from_state(
                        modules, state, use_ema=False, batch_size=32768,
                        precision="int8", static_act_quant=static,
                    )
                    eng._build_switch(tile=tile)
                    stats = eng.throughput_bulk(n_showers=262144)
                    sps = stats["showers_per_sec"]
                    print(f"w={width} static={int(static)} T={tile:3d}: "
                          f"{sps:10,.0f} showers/s "
                          f"({1e6/sps:6.2f} us/shower)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"w={width} static={static} T={tile} FAILED: "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
