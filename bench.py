#!/usr/bin/env python
"""Fast-sim throughput benchmark.

Prints ONE JSON line:
``{"metric": "fastsim_throughput", "value": N, "unit": "showers/sec/chip",
"vs_baseline": N/50000}``.

Baseline: BASELINE.json north star (>= 50,000 generated showers/sec/chip on
TPU; the reference publishes no numbers of its own — BASELINE.md).

Primary path: the PRODUCTION serving configuration — the fastest
fidelity-gated distilled student (each gated at the same 1.5x-floor
criterion as the teacher, experiments/distill_r4.jsonl: w=0.125 1.163x,
w=0.1875 1.160x, w=0.25 1.190x, w=0.375 1.098x, w=0.5 1.061x, all PASS
vs teacher 1.116-1.153x; weights committed under artifacts/gate/) on
the bulk int8 tiled-switch path at its measured optimum (B=32768; tile
from the distill_r4 ladder). Fallbacks ladder down through wider
students to the full-width teacher path, then bf16. w=0.125 is the
width floor: every conv is at the 32-channel minimum.
"""

from __future__ import annotations

import json
import os
import sys

BASELINE_SHOWERS_PER_SEC = 50_000.0
# (artifact path, dispatch tile) fastest-first; each width's tile is its
# measured optimum from the distill_r4.jsonl ladder (w=0.125 388.8k @128,
# w=0.1875 369.1k @256, w=0.25 277.5k @128, w=0.375 218.6k @128,
# w=0.5 95.5k @128 showers/s).
STUDENT_LADDER = (
    ("artifacts/gate/student_w0.125_serving_weights.npz", 128),
    ("artifacts/gate/student_w0.1875_serving_weights.npz", 256),
    ("artifacts/gate/student_w0.25_serving_weights.npz", 128),
    ("artifacts/gate/student_w0.375_serving_weights.npz", 128),
    ("artifacts/gate/student_w0.5_serving_weights.npz", 128),
)


def main() -> int:
    import jax

    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()

    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    cfg = load_config(overrides=["model.n_experts=3"])
    modules = build_moe(cfg)

    # Primary path: the fastest fidelity-gated distilled student (the
    # committed production serving weights) on BULK tiled-switch int8 —
    # whole workload in one lax.scan program, per-chunk dispatch RTT never
    # paid, int8 MXU convs. Measured 277k showers/s at w=0.25 B=32768
    # T=128 (experiments/distill_r4.jsonl). Students enter this ladder
    # ONLY with a committed gate-passing artifact (distill_r4.jsonl
    # records the gate): throughput is weight-independent, but the benched
    # config must be a config production may actually serve.
    stats = None
    for artifact_path, tile in STUDENT_LADDER:
        if not os.path.exists(artifact_path):
            continue
        try:
            from zdcsim.utils.artifact import load_serving_artifact

            gp, gs, rp, meta = load_serving_artifact(artifact_path)
            cfg_s = load_config(overrides=[
                "model.n_experts=3",
                f"model.generator.width={float(meta.get('width', 0.5))}",
            ])
            engine = FastSim(
                build_moe(cfg_s), gp, gs, rp, batch_size=32768, precision="int8"
            )
            engine._build_switch(tile=tile)
            stats = engine.throughput_bulk(n_showers=262144)
            break
        except Exception as e:  # noqa: BLE001 — bench must always print a number
            print(f"student bench failed ({type(e).__name__}: {e}); "
                  "falling back", file=sys.stderr)

    # Teacher (full-width) ladder: best measured B=32768, tile=64, naive
    # int8 Conv_1 -> 41.3k showers/s (experiments/perf_naive_r3.py); then
    # B=8192, bulk bf16, per-call switch bf16, dense. The per-op Pallas
    # decode kernels ("int8_pallas"/"int8_pallas_ab") measured SLOWER in
    # bulk and stay out of the ladder; the fused-decode kernels are
    # measured-rejected on this Mosaic version (BENCH_LOG "Round-3 finale").
    if stats is None:
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
        for precision, batch, bulk in (("int8", 32768, True), ("int8", 8192, True),
                                       ("bf16", 8192, True), ("bf16", 4096, False)):
            try:
                engine = FastSim.from_state(
                    modules, state, use_ema=False, batch_size=batch, precision=precision
                )
                engine._build_switch(tile=64)
                if bulk:
                    stats = engine.throughput_bulk(n_showers=131072)
                else:
                    stats = engine.throughput_switch(n_batches=12, warmup=3)
                break
            except Exception as e:  # noqa: BLE001 — bench must always print a number
                print(f"{precision} bulk={bulk} bench failed ({type(e).__name__}); "
                      "falling back", file=sys.stderr)
        if stats is None:
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
