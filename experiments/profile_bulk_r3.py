"""Attempt a jax.profiler device trace of the bulk serving program.

Over the axon tunnel the device-side profiler may be unsupported; this
script tries, and reports whether usable trace events were produced (if
yes: the per-op bulk breakdown replaces ablation guessing).
"""

from __future__ import annotations

import glob
import os
import sys

import jax

sys.path.insert(0, "/root/repo")

LOGDIR = "/tmp/jax_trace_bulk"


def main():
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    eng = FastSim.from_state(
        modules3, state3, use_ema=False, batch_size=32768, precision="int8")
    eng._build_switch(tile=64)
    # warm/compile outside the trace
    eng.throughput_bulk(n_showers=32768)

    os.makedirs(LOGDIR, exist_ok=True)
    try:
        with jax.profiler.trace(LOGDIR):
            eng.throughput_bulk(n_showers=65536)
        files = glob.glob(os.path.join(LOGDIR, "**", "*"), recursive=True)
        total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
        print(f"trace files: {len(files)}, {total/1e6:.1f} MB", flush=True)
        for f in sorted(files)[:20]:
            print("  ", f, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"profiler FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
