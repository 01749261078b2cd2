"""Round-5 serving-lever A/B: static int8 activation scales x dyn dispatch.

The two built-but-unmeasured levers from VERDICT r4 #2, measured in ONE
process (compile cache shared) at the production point (bulk int8
tiled-switch, B=32768, T=128, in-scan scatter default):

- ``static``: FastSim(static_act_quant=True) — calibrated per-tensor int8
  activation scales; the quantize becomes reduce-free elementwise (the
  w=0.125 tile-branch budget attributes ~43% to quant/scale ops).
- ``dyn``: _build_switch(dyn_dispatch=True) — branchless tile decode via
  dynamic weight-tree gather instead of lax.switch (the budget's ~23%
  conditional-wrapper share).
- ``static+dyn``: both.

Usage: python experiments/perf_levers_r5.py [widths...] (default .125 .25 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "perf_levers_r5.jsonl")


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    widths = [float(a) for a in sys.argv[1:]] or [0.125, 0.25, 1.0]
    tile = 128
    results = []
    for width in widths:
        cfg = load_config(overrides=[
            "model.n_experts=3", f"model.generator.width={width}",
        ])
        modules = build_moe(cfg)
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
        for static in (False, True):
            for dyn in (False, True):
                name = f"w={width} static={int(static)} dyn={int(dyn)} T={tile}"
                try:
                    eng = FastSim.from_state(
                        modules, state, use_ema=False, batch_size=32768,
                        precision="int8", static_act_quant=static,
                    )
                    eng._build_switch(tile=tile, dyn_dispatch=dyn)
                    stats = eng.throughput_bulk(n_showers=262144)
                    sps = stats["showers_per_sec"]
                    rec = {
                        "width": width, "static": static, "dyn": dyn,
                        "tile": tile, "showers_per_sec": round(sps, 0),
                        "us_per_shower": round(1e6 / sps, 2),
                    }
                    if static:
                        rec["act_scale_headroom"] = round(
                            eng.act_scale_headroom, 3
                        )
                    results.append(rec)
                    with open(OUT, "a") as f:
                        f.write(json.dumps({**rec, "ts": time.time()}) + "\n")
                    print(f"{name}: {sps:10,.0f} showers/s "
                          f"({1e6/sps:6.2f} us/shower)"
                          + (f"  headroom={rec.get('act_scale_headroom')}"
                             if static else ""),
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                          flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
