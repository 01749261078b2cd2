"""In-BULK stage ablation: where do 24.7 us/shower actually go?

Decode-level measurements (B=4096) transferred poorly to bulk (tile=64)
all round — so measure the stage budget INSIDE the production bulk
program by monkeypatching fast_generator_apply with truncated variants
that keep the dispatch/scatter machinery and output shapes intact (a
tiny per-sample dependency prevents constant folding).

Arms (cumulative):
  dispatch-only  — no decode compute: the tiled-switch machinery ceiling
  mlp            — MLP + LN epilogue only
  +conv0         — ... + int8 conv0 + gn0
  +conv1         — ... + int8 conv1 + gn1
  full           — production decode (baseline 40.4k showers/s)

Differences between consecutive arms give the in-bulk stage costs; the
dispatch-only arm bounds what any decode optimization can ever reach.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    print("devices:", jax.devices(), flush=True)
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.models import proton_fast as pf
    from zdcsim.train.state import init_state_jit

    cfg3 = load_config(overrides=["model.n_experts=3"])
    modules3 = build_moe(cfg3)
    state3 = init_state_jit(modules3, cfg3, jax.random.PRNGKey(0))
    orig = pf.fast_generator_apply

    OUT = (56, 30, 1)  # proton decode output (fast_generator_apply verified)

    def bcast(x, b):
        dep = jnp.sum(x.reshape(b, -1).astype(jnp.float32), axis=1) * 1e-30
        return jnp.broadcast_to(dep[:, None, None, None], (b,) + OUT).astype(x.dtype)

    def upto(stage):
        def fga(params, noise, cond, int8=False, int8_backend="xla"):
            p = params
            b = noise.shape[0]
            x = jnp.concatenate([noise, cond], axis=1)
            if stage == "dispatch":
                return bcast(x, b)
            bp0 = p["MLPBlock_0"]
            x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
            x = pf._leaky(pf._layer_norm(x, bp0["LayerNorm_0"]))
            bp1 = p["MLPBlock_1"]
            x = x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]
            x = pf._leaky(pf._layer_norm(x, bp1["LayerNorm_0"]))
            if stage == "mlp":
                return bcast(x, b)
            x = x.reshape(-1, 18, 10, 512)
            x = pf.fused_upsample2_conv4_int8(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
            x = pf._leaky(pf._group_norm(x, p["GroupNorm2d_0"]["GroupNorm_0"], 256))
            if stage == "conv0":
                return bcast(x, b)
            x = pf.fused_row_resize_conv4_int8(
                x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
            x = pf._leaky(pf._group_norm(x, p["GroupNorm2d_1"]["GroupNorm_0"], 128))
            if stage == "conv1":
                return bcast(x, b)
            raise ValueError(stage)

        return fga

    arms = [("dispatch-only", upto("dispatch")), ("mlp", upto("mlp")),
            ("+conv0", upto("conv0")), ("+conv1", upto("conv1")),
            ("full", orig)]
    try:
        for name, fn in arms:
            pf.fast_generator_apply = fn
            eng = FastSim.from_state(
                modules3, state3, use_ema=False, batch_size=32768, precision="int8")
            eng._build_switch(tile=64)
            stats = eng.throughput_bulk(n_showers=131072)
            sps = stats["showers_per_sec"]
            print(f"{name:14s}: {sps:10,.0f} showers/s  ({1e6/sps:6.2f} us/shower)",
                  flush=True)
    finally:
        pf.fast_generator_apply = orig


if __name__ == "__main__":
    main()
