"""jax.profiler trace of the TRAINING step (VERDICT r3 #7).

Serving got three rounds of leaf-op budgets; training got none. This
captures one xplane trace of (a) the dense bf16 train step and (b) the
switch-dispatch train step at production scale (proton, E=3, B=512),
for experiments/xplane_parse.py to aggregate into the same per-op
budget that unlocked the serving ladder.

Usage: python experiments/profile_train_r4.py [dense|switch|both]
Traces land in /tmp/jax_trace_train_{dense,switch}/.
"""

from __future__ import annotations

import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build(dispatch: str):
    from zdcsim.config import load_config
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state_jit
    from zdcsim.train.step import build_train_step

    overrides = [
        "model.n_experts=3", "train.batch_size=512", "train.precision=bf16",
    ]
    if dispatch == "switch":
        overrides += [
            "train.dispatch=switch",
            "model.router.differentiable_gan_term=false",
        ]
    cfg = load_config(overrides=overrides)
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    B = 512
    key = jax.random.PRNGKey(1)
    mk = lambda i, shape: jnp.abs(jax.random.normal(jax.random.fold_in(key, i), shape))
    batch = {
        "real": mk(0, (B, 56, 30, 1)),
        "cond": mk(1, (B, 9)),
        "std": mk(2, (B, 1)),
        "intensity": mk(3, (B, 1)),
        "positions": mk(4, (B, 2)),
    }
    return step, state, batch


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    for dispatch in ("dense", "switch"):
        if which not in (dispatch, "both"):
            continue
        logdir = f"/tmp/jax_trace_train_{dispatch}"
        os.makedirs(logdir, exist_ok=True)
        step, state, batch = build(dispatch)
        t0 = time.time()
        state, m = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
        print(f"{dispatch}: compile+first step {time.time()-t0:.0f}s "
              f"gen_loss={float(m['gen_loss']):.3f}", flush=True)
        # timed steps outside the trace (RTT-free wall estimate: 5 chained)
        t0 = time.time()
        for i in range(5):
            state, m = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(3), i),
                            jnp.asarray(1))
        float(m["gen_loss"])
        print(f"{dispatch}: {(time.time()-t0)/5*1e3:.0f} ms/step (chained x5)",
              flush=True)
        with jax.profiler.trace(logdir):
            state, m = step(state, batch, jax.random.PRNGKey(4), jnp.asarray(2))
            float(m["gen_loss"])
        files = [f for f in glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
                 if os.path.isfile(f)]
        total = sum(os.path.getsize(f) for f in files)
        print(f"{dispatch}: trace {len(files)} files, {total/1e6:.1f} MB -> {logdir}",
              flush=True)
        xp = [f for f in files if f.endswith("xplane.pb")]
        if xp:
            print(f"{dispatch}: parse with: python experiments/xplane_parse.py {xp[0]} 40",
                  flush=True)


if __name__ == "__main__":
    main()
