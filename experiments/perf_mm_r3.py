"""Per-tap matmul ("mm") int8 conv formulation vs XLA convs, at tile shape.

In-bulk ablation (perf_bulk_ablate_r3) puts conv0+gn0 at 8.05 us/shower
and conv1+gn1 at 10.44 us/shower against int8 speed-of-light of 2.8/3.1 —
~30-35% MXU utilization. Hypothesis: XLA's conv lowering pays layout
padding on the tiny spatial dims (int8 wants (32,128) tiles; W=10/19/30),
while the same contraction expressed as per-tap ``dot_general`` over
flattened ``[B*H*W, Cin]`` operands has both dims large and aligned.
Integer accumulation is order-invariant, so the per-tap sum is
bit-identical to the conv.

Measures, at production tile shape B=64 (in-jit x ITERS, real chip):
  conv0: 4-phase XLA int8 convs (current)  vs per-tap mm (same phases)
  conv1: folded row-phase XLA (current)    vs naive 16-tap mm on resized grid
                                           vs XLA naive conv on resized grid
  conv2: XLA 3x3 int8 (current)            vs 9-tap mm
All variants include dequant to f32 (and interleave where the current path
has one) so the comparison is stage-for-stage.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from zdcsim.models import proton_fast as pf  # noqa: E402

ITERS = int(os.environ.get("MM_ITERS", "100"))


def rep(op, *args, iters=ITERS):
    """op(*args) repeated with a scalar feedback dep on the first arg."""

    def run(x0, *rest):
        def body(c, _):
            y = op(c, *rest)
            s = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(jnp.float32)
            # feed back into the int8 input without changing values
            return (c ^ jnp.asarray(s == 1e30, jnp.int8)), None

        xf, _ = lax.scan(body, x0, None, length=iters)
        return jnp.sum(xf.astype(jnp.int32))

    return jax.jit(run)


def timeit(name, fn, *args, flops=None):
    out = fn(*args)
    float(out)  # compile+run
    t0 = time.perf_counter()
    float(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    msg = f"{name:28s}: {dt*1e6:9.1f} us/op"
    if flops:
        msg += f"  ({flops/dt/1e12:6.1f} Tops, {100*flops/dt/394e12:4.1f}% int8 peak)"
    print(msg, flush=True)
    return dt


def tap_mm(xpad, kq, ho, wo):
    """sum over taps of dot(slice, k[a,c]) — int32 accumulation."""
    r, s, cin, cout = kq.shape
    b = xpad.shape[0]
    acc = None
    for a in range(r):
        for c in range(s):
            sl = lax.slice(xpad, (0, a, c, 0), (b, a + ho, c + wo, cin))
            y = lax.dot_general(
                sl.reshape(b * ho * wo, cin), kq[a, c],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
            )
            acc = y if acc is None else acc + y
    return acc.reshape(b, ho, wo, cout)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    B = 64

    # ------------------------------------------------ conv0 (18x10x512 -> 35x19x256)
    x0 = jax.random.randint(key, (B, 18, 10, 512), -127, 127, jnp.int8)
    w0 = jax.random.normal(key, (4, 4, 512, 256), jnp.float32) * 0.05
    macs0 = 4224 * 512 * 256 * B * 2  # phase tap-positions (proton_fast docstring)

    def phases_of(w):
        k_er = jnp.stack([w[0], w[1] + w[2], w[3]])
        k_or = jnp.stack([w[0] + w[1], w[2] + w[3]])

        def split_cols(k):
            ke = jnp.stack([k[:, 0], k[:, 1] + k[:, 2], k[:, 3]], axis=1)
            ko = jnp.stack([k[:, 0] + k[:, 1], k[:, 2] + k[:, 3]], axis=1)
            return ke, ko

        k_ee, k_eo = split_cols(k_er)
        k_oe, k_oo = split_cols(k_or)
        return [pf._quant_per_cout(k) for k in (k_ee, k_eo, k_oe, k_oo)]

    (kee, see), (keo, seo), (koe, soe), (koo, soo) = [
        (q, s) for q, s in phases_of(w0)
    ]

    def conv0_xla(xq):
        y_ee = pf._conv_i8(xq, kee, ((1, 1), (1, 1))).astype(jnp.float32) * see
        y_eo = pf._conv_i8(xq, keo, ((1, 1), (0, 0))).astype(jnp.float32) * seo
        y_oe = pf._conv_i8(xq, koe, ((0, 0), (1, 1))).astype(jnp.float32) * soe
        y_oo = pf._conv_i8(xq, koo, ((0, 0), (0, 0))).astype(jnp.float32) * soo
        rows_even = pf._interleave(y_ee, y_eo, axis=2)
        rows_odd = pf._interleave(y_oe, y_oo, axis=2)
        return pf._interleave(rows_even, rows_odd, axis=1)

    def conv0_mm(xq):
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y_ee = tap_mm(xp, kee, 18, 10).astype(jnp.float32) * see
        y_eo = tap_mm(xp[:, :, 1:-1], keo, 18, 9).astype(jnp.float32) * seo
        y_oe = tap_mm(xp[:, 1:-1, :], koe, 17, 10).astype(jnp.float32) * soe
        y_oo = tap_mm(xp[:, 1:-1, 1:-1], koo, 17, 9).astype(jnp.float32) * soo
        rows_even = pf._interleave(y_ee, y_eo, axis=2)
        rows_odd = pf._interleave(y_oe, y_oo, axis=2)
        return pf._interleave(rows_even, rows_odd, axis=1)

    a = np.asarray(jax.jit(conv0_xla)(x0))
    b = np.asarray(jax.jit(conv0_mm)(x0))
    print("conv0 mm == xla:", np.array_equal(a, b), flush=True)
    timeit("conv0 phase-conv XLA", rep(conv0_xla), x0, flops=macs0)
    timeit("conv0 per-tap mm", rep(conv0_mm), x0, flops=macs0)

    # ------------------------------------------------ conv1 (resized 56x30x256 -> 55x29x128)
    x1f = jax.random.normal(key, (B, 35, 19, 256), jnp.float32)
    w1 = jax.random.normal(key, (4, 4, 256, 128), jnp.float32) * 0.05
    macs1_folded = int(55 * 29 * 2.9 * 4 * 256 * 128 * B * 2)
    macs1_naive = 55 * 29 * 16 * 256 * 128 * B * 2

    def conv1_folded(xf):
        return pf.fused_row_resize_conv4_int8(xf, w1, jnp.zeros(128), 56, 30)

    col_map = np.floor((np.arange(30) + 0.5) * 19 / 30).astype(int)
    row_map = np.floor((np.arange(56) + 0.5) * 35 / 56).astype(int)
    kq1, sk1 = pf._quant_per_cout(w1)

    def conv1_mm(xf):
        xq, sx = pf._quant_act(xf)
        xr = xq[:, row_map][:, :, col_map]  # [B,56,30,256] int8
        xp = jnp.pad(xr, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = tap_mm(xp, kq1, 55, 29)
        return y.astype(jnp.float32) * (sk1 * sx)

    def conv1_xla_naive(xf):
        xq, sx = pf._quant_act(xf)
        xr = xq[:, row_map][:, :, col_map]
        y = pf._conv_i8(xr, kq1, ((1, 1), (1, 1)))
        return y.astype(jnp.float32) * (sk1 * sx)

    a = np.asarray(jax.jit(conv1_mm)(x1f))
    b = np.asarray(jax.jit(conv1_xla_naive)(x1f))
    print("conv1 mm == xla-naive:", np.array_equal(a, b), flush=True)
    timeit("conv1 folded XLA (current)", rep2(conv1_folded), x1f, flops=macs1_folded)
    timeit("conv1 naive 16-tap mm", rep2(conv1_mm), x1f, flops=macs1_naive)
    timeit("conv1 naive XLA conv", rep2(conv1_xla_naive), x1f, flops=macs1_naive)

    # ------------------------------------------------ conv2 (55x29x128 -> 55x29x64)
    x2f = jax.random.normal(key, (B, 55, 29, 128), jnp.float32)
    w2 = jax.random.normal(key, (3, 3, 128, 64), jnp.float32) * 0.05
    macs2 = 55 * 29 * 9 * 128 * 64 * B * 2
    kq2, sk2 = pf._quant_per_cout(w2)

    def conv2_xla(xf):
        xq, sx = pf._quant_act(xf)
        y = pf._conv_i8(xq, kq2, ((1, 1), (1, 1)))
        return y.astype(jnp.float32) * (sk2 * sx)

    def conv2_mm(xf):
        xq, sx = pf._quant_act(xf)
        xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = tap_mm(xp, kq2, 55, 29)
        return y.astype(jnp.float32) * (sk2 * sx)

    a = np.asarray(jax.jit(conv2_xla)(x2f))
    b = np.asarray(jax.jit(conv2_mm)(x2f))
    print("conv2 mm == xla:", np.array_equal(a, b), flush=True)
    timeit("conv2 3x3 XLA (current)", rep2(conv2_xla), x2f, flops=macs2)
    timeit("conv2 9-tap mm", rep2(conv2_mm), x2f, flops=macs2)


def rep2(op, iters=ITERS):
    """float-input variant of rep (feedback via tiny additive term)."""

    def run(x0):
        def body(c, _):
            y = op(c)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-30
            return c + s.astype(c.dtype), None

        xf, _ = lax.scan(body, x0, None, length=iters)
        return jnp.sum(xf.astype(jnp.float32))

    return jax.jit(run)


if __name__ == "__main__":
    main()
