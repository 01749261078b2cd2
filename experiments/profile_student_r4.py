"""jax.profiler device trace of the width-floor student bulk program.

The w=0.125 student serves 388.8k showers/s and the width ladder has
flattened (BENCH_LOG "width-floor students") — the bulk program is
dispatch/overhead-bound, not conv-bound. This trace + xplane_parse.py
produces the leaf-op budget at student scale so the top overhead line can
be attacked directly (the same method that unlocked the teacher path in
round 3: experiments/profile_bulk_r3.py -> naive Conv_1 + one-hot resize).

Usage: python experiments/profile_student_r4.py [width] [tile]
Then:  python experiments/xplane_parse.py /tmp/jax_trace_student/**/*.xplane.pb
"""

from __future__ import annotations

import glob
import os
import sys

import jax

sys.path.insert(0, "/root/repo")

LOGDIR = "/tmp/jax_trace_student"


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit

    width = float(sys.argv[1]) if len(sys.argv) > 1 else 0.125
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = load_config(overrides=[
        "model.n_experts=3", f"model.generator.width={width}",
    ])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    eng = FastSim.from_state(
        modules, state, use_ema=False, batch_size=32768, precision="int8")
    eng._build_switch(tile=tile)
    # warm/compile outside the trace
    stats = eng.throughput_bulk(n_showers=65536)
    print(f"warm w={width} T={tile}: {stats['showers_per_sec']:,.0f} "
          f"showers/s", flush=True)

    os.makedirs(LOGDIR, exist_ok=True)
    try:
        with jax.profiler.trace(LOGDIR):
            eng.throughput_bulk(n_showers=131072)
        files = glob.glob(os.path.join(LOGDIR, "**", "*"), recursive=True)
        total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
        print(f"trace files: {len(files)}, {total/1e6:.1f} MB", flush=True)
        for f in sorted(files):
            if f.endswith(".xplane.pb"):
                print("  ", f, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"profiler FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
