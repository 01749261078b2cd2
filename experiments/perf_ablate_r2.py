"""Ablation inside the int8 bulk decode: where do the non-conv milliseconds
go? Each variant stubs one stage; the delta vs full is that stage's cost.

Variants (all bulk x8 chunks of B=4096, int8 convs):
  full        - the production int8 fast path
  no-gn       - GroupNorms replaced by identity (keep leaky)
  no-quant    - int8 convs replaced by bf16 convs (isolates quant+int8 win)
  no-mlp      - MLP replaced by a broadcast constant (isolates MLP cost)
  gn-matmul   - GN stats via channel-group matmul instead of reshape
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

from zdcsim.config import load_config  # noqa: E402
from zdcsim.models import build_moe  # noqa: E402
from zdcsim.models.proton_fast import (  # noqa: E402
    _conv, _group_norm, _layer_norm, _leaky,
    fused_row_resize_conv4_int8, fused_upsample2_conv4_int8,
)
from zdcsim.train.state import init_state_jit  # noqa: E402

B, CHUNKS = 4096, 8


def timed_bulk(decode, gp, name):
    key = jax.random.PRNGKey(0)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), jnp.bfloat16)

    def bulk(cond, k0):
        def body(c, i):
            kk = jax.random.fold_in(k0, i)
            noise = jax.random.normal(kk, (B, 10), jnp.bfloat16)
            img = decode(gp, noise, cond)
            return c + jnp.sum(img.astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(CHUNKS))
        return s

    f = jax.jit(bulk)
    out = f(cond, jax.random.PRNGKey(9)); float(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(cond, jax.random.PRNGKey(9)); float(out)
    dt = (time.perf_counter() - t0) / 3
    per_chunk = dt / CHUNKS * 1e3
    print(f"{name:28s} {per_chunk:8.2f} ms/chunk  {B*CHUNKS/dt:>10,.0f} showers/s", flush=True)
    return per_chunk


def make_decode(gn=True, int8=True, mlp=True):
    def decode(p, noise, cond):
        if mlp:
            x = jnp.concatenate([noise, cond], axis=1)
            for blk in ("MLPBlock_0", "MLPBlock_1"):
                bp = p[blk]
                x = x @ bp["Dense_0"]["kernel"] + bp["Dense_0"]["bias"]
                x = _layer_norm(x, bp["LayerNorm_0"])
                x = _leaky(x)
            x = x.reshape(-1, 18, 10, 512)
        else:
            x = jnp.broadcast_to(
                noise[:, :1, None, None], (noise.shape[0], 18, 10, 512)
            ).astype(noise.dtype)
        if int8:
            x = fused_upsample2_conv4_int8(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
        else:
            from zdcsim.models.proton_fast import fused_upsample2_conv4
            x = fused_upsample2_conv4(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
        if gn:
            x = _group_norm(x, p["GroupNorm2d_0"]["GroupNorm_0"], 256)
        x = _leaky(x)
        if int8:
            x = fused_row_resize_conv4_int8(x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
        else:
            from zdcsim.models.proton_fast import fused_row_resize_conv4
            x = fused_row_resize_conv4(x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
        if gn:
            x = _group_norm(x, p["GroupNorm2d_1"]["GroupNorm_0"], 128)
        x = _leaky(x)
        x = _conv(x, p["Conv_2"]["kernel"], ((1, 1), (1, 1))) + p["Conv_2"]["bias"]
        if gn:
            x = _group_norm(x, p["GroupNorm2d_2"]["GroupNorm_0"], 64)
        x = _leaky(x)
        x = _conv(x, p["Conv_3"]["kernel"], ((1, 1), (1, 1))) + p["Conv_3"]["bias"]
        return jax.nn.relu(x)

    return decode


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = load_config(overrides=["model.n_experts=1"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, jax.random.PRNGKey(0))
    gp = jax.tree_util.tree_map(
        lambda p: p[0].astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p[0],
        state.gen.params,
    )
    t_full = timed_bulk(make_decode(), gp, "full int8")
    t_nogn = timed_bulk(make_decode(gn=False), gp, "no GN")
    t_bf16 = timed_bulk(make_decode(int8=False), gp, "bf16 convs")
    t_nomlp = timed_bulk(make_decode(mlp=False), gp, "no MLP")
    print(f"\nGN cost     ~ {t_full - t_nogn:6.2f} ms/chunk", flush=True)
    print(f"int8 win    ~ {t_bf16 - t_full:6.2f} ms/chunk", flush=True)
    print(f"MLP cost    ~ {t_full - t_nomlp:6.2f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
