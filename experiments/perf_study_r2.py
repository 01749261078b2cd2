"""Round-2 serving perf study on the real chip (batch ALL experiments into
one process: remote compiles are 1-4 min each and don't cache across runs).

Answers, with forced execution (scalar readback — block_until_ready lies over
the tunnel):
  1. Stage timing of the fused single-expert decode at B=4096 bf16: where do
     the milliseconds actually go (MLP / conv0 / conv1 / conv2 / GNs /
     interleaves)?
  2. MXU microbenches: achievable bf16 matmul peak at our shapes; int8
     dot_general (explicit preferred_element_type=int32); int8 vs bf16 conv.
  3. Decisions: int8 decode path / pallas conv / layout fixes.

Usage: python experiments/perf_study_r2.py [--quick]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B = 4096
STEPS = 10
WARMUP = 3


def timed(fn, *args, steps=STEPS, warmup=WARMUP, name=""):
    """Steady-state seconds/call with scalar-readback forcing."""
    f = jax.jit(fn)
    for i in range(warmup):
        out = f(*args)
        s = float(jnp.asarray(out).sum()) if not isinstance(out, tuple) else float(
            jnp.asarray(out[0]).sum())
    t0 = time.perf_counter()
    for i in range(steps):
        out = f(*args)
        s = float(jnp.asarray(out).sum()) if not isinstance(out, tuple) else float(
            jnp.asarray(out[0]).sum())
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:42s} {dt*1e3:9.2f} ms  ({s:.3e})", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # ---- build generator params + fused forward ----
    from zdcsim.config import load_config
    from zdcsim.models import build_moe
    from zdcsim.models.proton_fast import (
        _group_norm, _layer_norm, _leaky, fast_generator_apply,
        fused_row_resize_conv4, fused_upsample2_conv4, _conv,
    )
    from zdcsim.train.state import init_state_jit

    cfg = load_config(overrides=["model.n_experts=1"])
    modules = build_moe(cfg)
    state = init_state_jit(modules, cfg, key)
    # single expert slice, bf16
    gp = jax.tree_util.tree_map(
        lambda p: p[0].astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p[0],
        state.gen.params,
    )
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10), dtype)
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9), dtype)

    t_full = timed(lambda n, c: fast_generator_apply(gp, n, c), noise, cond,
                   name="full fused decode B=4096")
    print(f"  -> {B / t_full:,.0f} showers/s", flush=True)

    # ---- stage inputs (materialized once) ----
    def stage_mlp(n, c):
        x = jnp.concatenate([n, c], axis=1)
        for blk in ("MLPBlock_0", "MLPBlock_1"):
            bp = gp[blk]
            x = x @ bp["Dense_0"]["kernel"] + bp["Dense_0"]["bias"]
            x = _layer_norm(x, bp["LayerNorm_0"])
            x = _leaky(x)
        return x.reshape(-1, 18, 10, 512)

    x0 = jax.jit(stage_mlp)(noise, cond)  # [B,18,10,512]
    timed(stage_mlp, noise, cond, name="stage: MLP -> [B,18,10,512]")

    def stage_conv0(x):
        return fused_upsample2_conv4(x, gp["Conv_0"]["kernel"], gp["Conv_0"]["bias"])

    x1 = jax.jit(stage_conv0)(x0)  # [B,35,19,256]
    timed(stage_conv0, x0, name="stage: fused up2+conv0 (35x19x256)")

    def stage_gn0(x):
        return _leaky(_group_norm(x, gp["GroupNorm2d_0"]["GroupNorm_0"], 256))

    x1n = jax.jit(stage_gn0)(x1)
    timed(stage_gn0, x1, name="stage: GN0+leaky")

    def stage_conv1(x):
        return fused_row_resize_conv4(x, gp["Conv_1"]["kernel"], gp["Conv_1"]["bias"], 56, 30)

    x2 = jax.jit(stage_conv1)(x1n)  # [B,55,29,128]
    timed(stage_conv1, x1n, name="stage: row-folded resize+conv1 (55x29x128)")

    # plain (unfused) conv1 for comparison
    from zdcsim.models.layers import resize_nearest

    def stage_conv1_plain(x):
        xr = resize_nearest(x, (56, 30))
        return _conv(xr, gp["Conv_1"]["kernel"], ((1, 1), (1, 1))) + gp["Conv_1"]["bias"]

    timed(stage_conv1_plain, x1n, name="stage: PLAIN resize+conv1")

    def stage_gn1(x):
        return _leaky(_group_norm(x, gp["GroupNorm2d_1"]["GroupNorm_0"], 128))

    x2n = jax.jit(stage_gn1)(x2)
    timed(stage_gn1, x2, name="stage: GN1+leaky")

    def stage_conv2(x):
        y = _conv(x, gp["Conv_2"]["kernel"], ((1, 1), (1, 1))) + gp["Conv_2"]["bias"]
        return _leaky(_group_norm(y, gp["GroupNorm2d_2"]["GroupNorm_0"], 64))

    x3 = jax.jit(stage_conv2)(x2n)
    timed(stage_conv2, x2n, name="stage: conv2 3x3 64 + GN2+leaky")

    def stage_conv3(x):
        return jax.nn.relu(_conv(x, gp["Conv_3"]["kernel"], ((1, 1), (1, 1))) + gp["Conv_3"]["bias"])

    timed(stage_conv3, x3, name="stage: conv3 2x2 -> 1 + relu")

    # ---- MXU microbenches ----
    print("\n--- MXU microbenches ---", flush=True)
    M, K, N = 8192, 2304, 512
    a16 = jax.random.normal(key, (M, K), jnp.bfloat16)
    b16 = jax.random.normal(key, (K, N), jnp.bfloat16)

    def mm_bf16(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t = timed(mm_bf16, a16, b16, name=f"bf16 matmul {M}x{K}x{N}")
    print(f"  -> {2*M*K*N/t/1e12:.1f} TFLOPs", flush=True)

    a8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)

    def mm_int8(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    t = timed(mm_int8, a8, b8, name=f"int8 matmul {M}x{K}x{N} (int32 acc)")
    print(f"  -> {2*M*K*N/t/1e12:.1f} TOPS", flush=True)

    # conv1-shaped conv in bf16 vs int8
    xc16 = jax.random.normal(key, (512, 57, 31, 256), jnp.bfloat16)
    kc16 = jax.random.normal(key, (4, 4, 256, 128), jnp.bfloat16)

    def conv_bf16(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    t = timed(conv_bf16, xc16, kc16, name="bf16 conv 4x4 512x57x31x256->128")
    fl = 2 * 512 * 54 * 28 * 16 * 256 * 128
    print(f"  -> {fl/t/1e12:.1f} TFLOPs", flush=True)

    xc8 = jax.random.randint(key, (512, 57, 31, 256), -127, 127, jnp.int8)
    kc8 = jax.random.randint(key, (4, 4, 256, 128), -127, 127, jnp.int8)

    def conv_int8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    try:
        t = timed(conv_int8, xc8, kc8, name="int8 conv 4x4 (int32 acc)")
        print(f"  -> {fl/t/1e12:.1f} TOPS", flush=True)
    except Exception as e:
        print("int8 conv failed:", repr(e)[:200], flush=True)

    # tap-decomposed conv as 16 shifted matmuls (bf16) — layout probe
    def conv_as_matmuls(x, k):
        bsz, h, w, cin = x.shape
        cout = k.shape[-1]
        ho, wo = h - 3, w - 3
        acc = jnp.zeros((bsz, ho, wo, cout), jnp.float32)
        for dr in range(4):
            for dc in range(4):
                xs = x[:, dr:dr + ho, dc:dc + wo, :].reshape(-1, cin)
                acc += jax.lax.dot_general(
                    xs, k[dr, dc], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).reshape(bsz, ho, wo, cout)
        return acc

    t = timed(conv_as_matmuls, xc16, kc16, name="bf16 conv as 16 tap-matmuls")
    print(f"  -> {fl/t/1e12:.1f} TFLOPs", flush=True)

    # ---- Pallas fused epilogue vs XLA (eval.fused_epilogue decision) ----
    print("\n--- epilogue: expm1+channel sums, B=4096 56x30 ---", flush=True)
    from zdcsim.ops.channels import sum_channels
    from zdcsim.ops.pallas_kernels import expm1_channel_sums

    img_log = jnp.abs(jax.random.normal(key, (4096, 56, 30), jnp.float32))
    timed(lambda x: sum_channels(jnp.expm1(x)), img_log, name="XLA expm1+sum_channels")
    try:
        timed(lambda x: expm1_channel_sums(x), img_log, name="Pallas fused epilogue")
    except Exception as e:
        print("pallas epilogue failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
