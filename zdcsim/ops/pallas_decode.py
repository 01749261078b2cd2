"""Pallas TPU kernels for the int8 serving decode hot path.

Round-2 profiling (BENCH_LOG.md) left two measured inefficiencies in the
production int8 bulk serving path (reference semantics being served:
``get_predictions_from_experts_results``, expertsim/train/utils.py:208-266):

1. the 92160-wide MLP LayerNorm is bandwidth-bound (~12 ms/chunk): XLA runs
   LN -> leaky -> (separate) activation-quant as multiple HBM passes;
2. the XLA int8 phase convs of ``fused_upsample2_conv4_int8`` reach only
   ~55-60% of int8 MXU peak, and the four phase outputs pay pad/stack/
   reshape interleave traffic in f32.

Two kernels close them:

- :func:`ln_leaky_rowquant` — ONE pass over the [B, 92160] MLP output:
  per-row LayerNorm statistics (f32), scale/bias, LeakyReLU(0.1), PER-SAMPLE
  symmetric int8 quantization. Emits the conv-ready int8 activations plus
  the [B] dequant scales. Per-sample activation scales are finer than the
  per-tensor scale the XLA path uses (strictly less quantization error).
- :func:`up2_conv4_int8` — the whole fused upsample2+Conv_0 in ONE kernel:
  the four parity-phase kernels (see zdcsim/models/proton_fast.py for the
  algebra) become 25 shifted int8 tap-matmuls on the MXU accumulating in
  int32 VMEM scratch, with per-phase/per-cout dequant, bias, and the
  2x2-phase interleave fused into the output layout — the [B,18,10,512]
  activation is read from HBM exactly once and the [B,35,19,256] result
  written exactly once.

Both kernels run in interpreter mode on CPU (exactness-tested in
tests/test_pallas_decode.py against int32-exact XLA references) and
compiled on TPU. Wired into :func:`zdcsim.models.proton_fast
.fast_generator_apply` via ``int8_backend="pallas"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The conv kernels' per-program working set (int8 taps + int32 acc + f32
# dequant intermediates, double-buffered in/out blocks) exceeds Mosaic's
# default 16M scoped-vmem budget at production block sizes; v5e has 128M
# VMEM, so raise the scoped limit rather than shrinking blocks.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except (RuntimeError, IndexError):
        return False


# ---------------------------------------------------------------------------
# Kernel A: fused LayerNorm + LeakyReLU + per-row int8 quantization
# ---------------------------------------------------------------------------

def _ln_quant_kernel(y_ref, scale_ref, bias_ref, q_ref, s_ref):
    y = y_ref[:].astype(jnp.float32)  # [TB, F]
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) * (y - mu), axis=1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + 1e-6)
    z = z * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    z = jnp.where(z >= 0, z, 0.1 * z)  # LeakyReLU(0.1)
    m = jnp.max(jnp.abs(z), axis=1, keepdims=True)  # [TB, 1]
    s = jnp.maximum(m / 127.0, 1e-12)
    q_ref[:] = jnp.clip(jnp.round(z / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def ln_leaky_rowquant(
    y: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
    block_rows: int = 8, interpret: bool | None = None,
):
    """``LayerNorm(y)*scale+bias -> LeakyReLU(0.1) -> per-row int8``.

    y: [B, F]; returns ``(q [B, F] int8, s [B, 1] f32)`` with the row ``i``
    activations ``~= q[i] * s[i]``. Statistics in float32 (the XLA serving
    path computes them in the bf16 compute dtype — this kernel is the more
    accurate of the two). One HBM read of ``y``, one write of ``q``.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, f = y.shape
    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)
    grid = (b // tb,)
    q, s = pl.pallas_call(
        _ln_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, f), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(y, scale.reshape(1, f), bias.reshape(1, f))
    return q, s


# ---------------------------------------------------------------------------
# Kernel B: all-phase int8 upsample2+conv4 with fused dequant + interleave
# ---------------------------------------------------------------------------

# Phase merged-kernel algebra (identical to proton_fast.fused_upsample2_conv4):
# phase (pr, pc) kernel rows/cols are merges of the original 4x4 taps; its
# (a, b) tap reads source offset (dr, dc) listed here.
_PHASE_OFFSETS = {
    "ee": [(a - 1, b - 1) for a in range(3) for b in range(3)],
    "eo": [(a - 1, b) for a in range(3) for b in range(2)],
    "oe": [(a, b - 1) for a in range(2) for b in range(3)],
    "oo": [(a, b) for a in range(2) for b in range(2)],
}
_PHASE_POS = {"ee": (0, 0), "eo": (0, 1), "oe": (1, 0), "oo": (1, 1)}
_PHASES = ("ee", "eo", "oe", "oo")
_PAD = 16  # scratch halo rows; covers |dr*W + dc| <= 11 for (H, W)=(18, 10)


def _phase_kernels(w: jnp.ndarray):
    """Original [4,4,cin,cout] kernel -> dict of merged phase kernels."""
    k_er = jnp.stack([w[0], w[1] + w[2], w[3]])
    k_or = jnp.stack([w[0] + w[1], w[2] + w[3]])

    def split_cols(k):
        ke = jnp.stack([k[:, 0], k[:, 1] + k[:, 2], k[:, 3]], axis=1)
        ko = jnp.stack([k[:, 0] + k[:, 1], k[:, 2] + k[:, 3]], axis=1)
        return ke, ko

    k_ee, k_eo = split_cols(k_er)
    k_oe, k_oo = split_cols(k_or)
    return {"ee": k_ee, "eo": k_eo, "oe": k_oe, "oo": k_oo}


def _quant_phases(w: jnp.ndarray):
    """Quantize each merged phase kernel per output channel; flatten taps.

    Returns ``(kq [25, cin, cout] int8, sk [4, cout] f32)`` in _PHASES/
    _PHASE_OFFSETS order.
    """
    ks = _phase_kernels(w.astype(jnp.float32))
    taps, scales = [], []
    for name in _PHASES:
        k = ks[name]  # [L_r, L_c, cin, cout]
        s = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
        q = jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8)
        lr, lc = k.shape[0], k.shape[1]
        assert [(a - (1 if name[0] == "e" else 0), b - (1 if name[1] == "e" else 0))
                for a in range(lr) for b in range(lc)] == _PHASE_OFFSETS[name]
        taps.append(q.reshape(lr * lc, k.shape[2], k.shape[3]))
        scales.append(s)
    return jnp.concatenate(taps, axis=0), jnp.stack(scales)


def _make_conv_kernel(h: int, w: int, tb: int, out_dtype):
    m = tb * h * w

    def kernel(xq_ref, sx_ref, kq_ref, sk_ref, bias_ref, out_ref, xpad, acc):
        # xq_ref: [TB, H*W, Cin] int8; xpad/acc: scratch
        cin = xq_ref.shape[-1]
        cout = out_ref.shape[-1]
        xpad[_PAD:_PAD + m, :] = xq_ref[:].reshape(m, cin)
        midx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        i_of = (midx // w) % h
        j_of = midx % w
        bias = bias_ref[:].astype(jnp.float32)
        sx = sx_ref[:].astype(jnp.float32)  # [TB, 1]

        tap = 0
        for p, name in enumerate(_PHASES):
            acc[:] = jnp.zeros((m, cout), jnp.int32)
            for (dr, dc) in _PHASE_OFFSETS[name]:
                s = dr * w + dc
                xs = xpad[_PAD + s:_PAD + s + m, :]
                valid = (
                    (i_of + dr >= 0) & (i_of + dr < h)
                    & (j_of + dc >= 0) & (j_of + dc < w)
                )
                xs = jnp.where(valid, xs, jnp.int8(0))
                acc[:] = acc[:] + jax.lax.dot_general(
                    xs, kq_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                tap += 1
            sk = sk_ref[p].astype(jnp.float32)  # [cout]
            val = acc[:].astype(jnp.float32) * sk[None, :]
            val = val.reshape(tb, h * w, cout) * sx[:, :, None]
            val = val + bias[None, None, :]
            pr, pc = _PHASE_POS[name]
            out_ref[:, :, pr, :, pc, :] = (
                val.reshape(tb, h, w, cout).astype(out_dtype)
            )

    return kernel


def up2_conv4_int8(
    xq: jnp.ndarray, sx: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    out_dtype=jnp.bfloat16, block_rows: int = 8, interpret: bool | None = None,
) -> jnp.ndarray:
    """``conv4x4(pad1, nearest_up2(x))`` on the int8 MXU, one Pallas kernel.

    xq: [B, H, W, Cin] int8 activations; sx: [B] (or [B, 1]) f32 per-sample
    dequant scales; kernel: [4, 4, Cin, Cout] float weights (phase-merged and
    per-cout quantized here — tiny, loop-invariant, hoisted out of scan
    loops by XLA); bias: [Cout]. Returns [B, 2H-1, 2W-1, Cout] ``out_dtype``,
    matching ``fused_upsample2_conv4`` up to quantization error.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w, cin = xq.shape
    cout = kernel.shape[-1]
    kq, sk = _quant_phases(kernel)
    n_taps = kq.shape[0]
    sx = sx.reshape(b, 1).astype(jnp.float32)

    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)
    m = tb * h * w
    grid = (b // tb,)

    out = _call_up2(xq, sx, kq, sk, bias, h, w, cin, cout, tb, out_dtype, interpret)
    # fused interleave: [B, H, 2, W, 2, C] == rows/cols interleaved; trim the
    # out-of-range odd-phase tail exactly like the XLA interleave path.
    return out.reshape(b, 2 * h, 2 * w, cout)[:, : 2 * h - 1, : 2 * w - 1, :]


def _call_up2(xq, sx, kq, sk, bias, h, w, cin, cout, tb, out_dtype, interpret):
    b = xq.shape[0]
    m = tb * h * w
    n_taps = kq.shape[0]
    grid = (b // tb,)
    out = pl.pallas_call(
        _make_conv_kernel(h, w, tb, out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, h * w, cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_taps, cin, cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, h, 2, w, 2, cout), lambda i: (i, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 2, w, 2, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m + 2 * _PAD, cin), jnp.int8),
            pltpu.VMEM((m, cout), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(xq.reshape(b, h * w, cin), sx, kq, sk, bias.reshape(1, cout))
    return out


# ---------------------------------------------------------------------------
# Kernel C: fused GroupNorm + LeakyReLU + per-sample int8 quantization
# ---------------------------------------------------------------------------

def _make_gn_kernel(h, w, c, groups, tb):
    hw = h * w
    cg = c // groups

    def kernel(x_ref, gmat_ref, scale_ref, bias_ref, q_ref, s_ref):
        x = x_ref[:].astype(jnp.float32).reshape(tb, hw, c)
        gmat = gmat_ref[:].astype(jnp.float32)  # [C, G] 0/1 group membership
        # per-(sample, group) stats WITHOUT lane-crossing reshapes: group
        # sums via an MXU contraction against the membership matrix.
        s1 = jnp.einsum("bpc,cg->bg", x, gmat)  # [TB, G]
        s2 = jnp.einsum("bpc,cg->bg", x * x, gmat)
        cnt = float(hw * cg)
        mu_g = s1 / cnt
        var_g = jnp.maximum(s2 / cnt - mu_g * mu_g, 0.0)
        mu_c = jnp.einsum("bg,cg->bc", mu_g, gmat)  # broadcast back per channel
        inv_c = jnp.einsum("bg,cg->bc", jax.lax.rsqrt(var_g + 1e-6), gmat)
        y = (x - mu_c[:, None, :]) * inv_c[:, None, :]
        y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
        y = jnp.where(y >= 0, y, 0.1 * y)
        mx = jnp.max(jnp.abs(y.reshape(tb, hw * c)), axis=1, keepdims=True)
        s = jnp.maximum(mx / 127.0, 1e-12)  # [TB, 1]
        q_ref[:] = (
            jnp.clip(jnp.round(y / s[:, :, None]), -127, 127)
            .astype(jnp.int8).reshape(tb, hw, c)
        )
        s_ref[:] = s

    return kernel


def gn_leaky_rowquant(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, groups: int = 32,
    block_rows: int = 8, interpret: bool | None = None,
):
    """``GroupNorm(x)*scale+bias -> LeakyReLU(0.1) -> per-sample int8``.

    x: [B, H, W, C] (NHWC); GroupNorm statistics per (sample, group) over
    H, W and the group's channels, matching ``flax.linen.GroupNorm`` /
    ``proton_fast._group_norm``. Returns ``(q [B, H, W, C] int8,
    s [B, 1] f32)``. One HBM read, one (int8) write — the conv0 -> conv1
    bridge of the serving decode. Group sums are MXU contractions against a
    0/1 membership matrix (no lane-crossing reshapes on TPU).

    NOTE: group variance uses the one-pass E[x^2]-E[x]^2 form in f32 —
    adequate for post-GN activation scales (values O(1)); exactness vs the
    two-pass XLA GN is tested to 1e-4.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, h, w, c = x.shape
    assert c % groups == 0
    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)
    gmat = jnp.asarray(
        (jnp.arange(c)[:, None] // (c // groups)) == jnp.arange(groups)[None, :],
        jnp.float32,
    )
    q, s = pl.pallas_call(
        _make_gn_kernel(h, w, c, groups, tb),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * w, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(x.reshape(b, h * w, c), gmat, scale.reshape(1, c), bias.reshape(1, c))
    return q.reshape(b, h, w, c), s


# ---------------------------------------------------------------------------
# Kernel D: int8 row-resize conv (Conv_1) — phase-im2col in VMEM
# ---------------------------------------------------------------------------

def _row_phase_plan(n_in: int, n_out: int, ksize: int, pad: int):
    from zdcsim.models.proton_fast import _row_phase_plan as plan

    return plan(n_in, n_out, ksize, pad)


def _quant_row_phases(w: jnp.ndarray, plans):
    """Per-phase merged row-group kernels, padded to a uniform group count.

    w: [4, 4, cin, cout]. Returns ``(kq [Q, maxL*4, cin, cout] int8,
    sk [Q, cout] f32, taps [Q][maxL] row-offset table, maxL)``.
    """
    w = w.astype(jnp.float32)
    max_l = max(len(groups) for _, groups, _ in plans)
    kqs, sks, offsets = [], [], []
    for d0, groups, _ in plans:
        ks = [sum(w[a] for a in taps) for _, taps in groups]  # each [4, cin, cout]
        ks += [jnp.zeros_like(ks[0])] * (max_l - len(ks))
        k_p = jnp.stack(ks)  # [maxL, 4, cin, cout]
        s = jnp.maximum(jnp.max(jnp.abs(k_p), axis=(0, 1, 2)) / 127.0, 1e-12)
        kqs.append(jnp.clip(jnp.round(k_p / s), -127, 127).astype(jnp.int8)
                   .reshape(max_l * 4, k_p.shape[2], k_p.shape[3]))
        sks.append(s)
        offs = [d for d, _ in groups] + [groups[0][0]] * (max_l - len(groups))
        offsets.append(offs)
    return jnp.stack(kqs), jnp.stack(sks), offsets, max_l


def _make_rowconv_kernel(tb, q_phases, w_cols, cin, cout, max_l, offsets,
                         h_src, out_dtype):
    """Conv_1 kernel body. Source rows padded to R5 = ceil((h_src+1+3)/5)*5
    and viewed as [n_g = R5/5 groups x 5 subrows]; each phase contracts a
    VMEM im2col operand [M, maxL*4*cin] against its flattened kernel.

    The phase computes n_g output rows per sample (not the n_r valid ones):
    flattening output and source over the SAME [TB, n_g, W] grid makes every
    tap a constant flat shift ``gsh*W + (b-1)`` — with fewer output rows the
    per-sample strides would differ and the shift would depend on the sample
    index (the round-3 first-cut bug). Surplus rows are masked garbage,
    trimmed by the caller's interleave slice."""
    r5 = -(-(h_src + 1 + 3) // 5) * 5
    n_g = r5 // 5
    m = tb * n_g * w_cols

    def kernel(x_ref, sx_ref, kq_ref, sk_ref, bias_ref, out_ref, xpad, col):
        # x_ref: [TB, h_src, w_cols, cin] int8
        xpad[:, 1:1 + h_src] = x_ref[:]
        bias = bias_ref[:].astype(jnp.float32)
        sx = sx_ref[:].astype(jnp.float32)
        midx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        r_of = (midx // w_cols) % n_g
        j_of = midx % w_cols

        for p in range(q_phases):
            # build the phase's im2col operand in VMEM
            for l in range(max_l):
                d = offsets[p][l]
                c_sub = (1 + d) % 5
                gsh = (1 + d) // 5
                xs_full = xpad[:].reshape(tb, n_g, 5, w_cols, cin)[:, :, c_sub]
                xs_flat = xs_full.reshape(tb * n_g * w_cols, cin)
                for bcol in range(4):
                    shift = gsh * w_cols + (bcol - 1)
                    lo = max(shift, 0)
                    # static roll via two-slice paste (shift in [-1, ~8*30])
                    seg = xs_flat[lo:lo + m]
                    if seg.shape[0] < m:
                        seg = jnp.concatenate(
                            [seg, jnp.zeros((m - seg.shape[0], cin), jnp.int8)]
                        )
                    if shift < 0:
                        seg = jnp.concatenate(
                            [jnp.zeros((-shift, cin), jnp.int8), seg[:m + shift]]
                        )
                    jc = j_of + (bcol - 1)
                    g_idx = r_of + gsh
                    src_row = 5 * g_idx + c_sub
                    valid = (
                        (jc >= 0) & (jc < w_cols)
                        & (src_row >= 1) & (src_row <= h_src) & (g_idx < n_g)
                    )
                    col[:, (l * 4 + bcol) * cin:(l * 4 + bcol + 1) * cin] = (
                        jnp.where(valid, seg, jnp.int8(0))
                    )
            acc = jax.lax.dot_general(
                col[:], kq_ref[p].reshape(max_l * 4 * cin, cout),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sk = sk_ref[p].astype(jnp.float32)
            val = acc.astype(jnp.float32) * sk[None, :]
            val = val.reshape(tb, n_g * w_cols, cout) * sx[:, :, None] + bias[None, None, :]
            out_ref[:, :, p, :, :] = (
                val.reshape(tb, n_g, w_cols, cout).astype(out_dtype)
            )

    return kernel, r5, n_g


def row_resize_conv4_int8(
    xq: jnp.ndarray, sx: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
    n_resized_rows: int, out_dtype=jnp.bfloat16, block_rows: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``conv4x4(pad1, resize_rows(x, n_resized_rows))`` on the int8 MXU.

    The Conv_1 pendant of :func:`up2_conv4_int8`: the nearest row-resize
    (35 -> 56 for the proton generator) has period-q row phases
    (``proton_fast._row_phase_plan``); each phase's merged row-group x
    column taps are gathered into ONE VMEM im2col operand and contracted in
    a single deep int8 matmul (K = maxL*4*Cin), with dequant + bias + the
    phase interleave fused into the output layout. Columns must already be
    resized (the XLA gather is cheap); xq: [B, H_src, W, Cin] int8 with
    per-sample scales sx.

    Returns [B, n_resized_rows - 1, W, Cout] (callers trim columns to the
    conv-valid W - 1, matching ``fused_row_resize_conv4``).
    """
    if interpret is None:
        interpret = not _is_tpu()
    b, h_src, w_cols, cin = xq.shape
    cout = kernel.shape[-1]
    q_phases, p_num, plans = _row_phase_plan(h_src, n_resized_rows, 4, 1)
    assert p_num == 5, "kernel specialized to the 35->56 stride-5 plan"
    kq, sk, offsets, max_l = _quant_row_phases(kernel, plans)
    sx = sx.reshape(b, 1).astype(jnp.float32)

    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)
    body, r5, n_g = _make_rowconv_kernel(
        tb, q_phases, w_cols, cin, cout, max_l, offsets, h_src, out_dtype
    )
    m = tb * n_g * w_cols
    out = pl.pallas_call(
        body,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, h_src, w_cols, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_phases, max_l * 4, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_phases, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tb, n_g, q_phases, w_cols, cout), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_g, q_phases, w_cols, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tb, r5, w_cols, cin), jnp.int8),
            pltpu.VMEM((m, max_l * 4 * cin), jnp.int8),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(xq, sx, kq, sk, bias.reshape(1, cout))
    # phase interleave: row i = r*q + p; trim to the valid row count
    return out.reshape(b, n_g * q_phases, w_cols, cout)[:, : n_resized_rows - 1]
