"""FLOP-reduced proton generator forward (exact algebraic refactor).

The proton generator's dominant cost is ``Conv_0``: a 4x4 conv over the
nearest-2x-upsampled 36x20x512 grid (zdcsim/models/proton.py:Generator,
reference expertsim/models/proton/generator.py:5-53). Nearest upsampling
duplicates every source pixel 2x2, so each conv window touches at most 3x3
*distinct* source pixels. :func:`fused_upsample2_conv4` folds the duplication
into four parity-phase kernels applied directly on the 18x10x512 grid —
**bit-equivalent output, 2.52x fewer MACs** (4224 vs 10640 tap-positions):

    phase (even row, even col): 3x3 kernel  [W0, W1+W2, W3] (x) same on cols
    phase (even, odd):          3x2
    phase (odd, even):          2x3
    phase (odd, odd):           2x2

:func:`fast_generator_apply` runs the full Generator forward with this
rewrite, consuming the standard ``Generator`` parameter tree unchanged —
serving/eval can switch paths without retraining or conversion. Equivalence
is asserted by ``tests/test_proton_fast.py`` to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from zdcsim.models.layers import group_norm_groups, resize_nearest, upsample_nearest


def _conv(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _interleave(even: jnp.ndarray, odd: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave even/odd slices along ``axis``; result length 2*E-1
    (odd has one fewer entry)."""
    pad_widths = [(0, 0)] * even.ndim
    pad_widths[axis] = (0, 1)
    odd_p = jnp.pad(odd, pad_widths)
    stacked = jnp.stack([even, odd_p], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] = 2 * even.shape[axis]
    out = stacked.reshape(shape)
    index = [slice(None)] * even.ndim
    index[axis] = slice(0, 2 * even.shape[axis] - 1)
    return out[tuple(index)]


@jax.custom_vjp
def fused_upsample2_conv4(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """``conv4x4(pad1, nearest_up2(x))`` without materializing the upsample.

    x: [B, H, W, Cin]; kernel: [4, 4, Cin, Cout] (HWIO); returns
    [B, 2H-1, 2W-1, Cout] — identical to the naive path.

    Custom VJP: the forward runs the FLOP-reduced phase decomposition; the
    backward differentiates the mathematically identical naive
    ``conv(pad, up2(x))`` form instead — XLA's standard conv gradients.
    Autodiff of the phase form transposes four padded interleaves, whose HLO
    temporaries OOM a 16 GB chip at B=512 (the round-1 'fast_generator is
    inference-only' limitation); the naive-form backward has the module
    path's memory profile, making ``train.fast_generator=true`` trainable.
    """
    w = kernel
    k_er = jnp.stack([w[0], w[1] + w[2], w[3]])  # even-row: 3 taps
    k_or = jnp.stack([w[0] + w[1], w[2] + w[3]])  # odd-row: 2 taps

    def split_cols(k):
        ke = jnp.stack([k[:, 0], k[:, 1] + k[:, 2], k[:, 3]], axis=1)
        ko = jnp.stack([k[:, 0] + k[:, 1], k[:, 2] + k[:, 3]], axis=1)
        return ke, ko

    k_ee, k_eo = split_cols(k_er)  # [3,3], [3,2]
    k_oe, k_oo = split_cols(k_or)  # [2,3], [2,2]

    y_ee = _conv(x, k_ee, ((1, 1), (1, 1)))  # [B, H,   W]
    y_eo = _conv(x, k_eo, ((1, 1), (0, 0)))  # [B, H,   W-1]
    y_oe = _conv(x, k_oe, ((0, 0), (1, 1)))  # [B, H-1, W]
    y_oo = _conv(x, k_oo, ((0, 0), (0, 0)))  # [B, H-1, W-1]

    rows_even = _interleave(y_ee, y_eo, axis=2)  # [B, H,   2W-1]
    rows_odd = _interleave(y_oe, y_oo, axis=2)  # [B, H-1, 2W-1]
    out = _interleave(rows_even, rows_odd, axis=1)  # [B, 2H-1, 2W-1]
    return out + bias


def _fused_up_fwd(x, kernel, bias):
    return fused_upsample2_conv4(x, kernel, bias), (x, kernel)


def _fused_up_bwd(res, g):
    x, kernel = res

    def naive(x_, k_):
        return _conv(
            jnp.pad(upsample_nearest(x_), ((0, 0), (1, 1), (1, 1), (0, 0))),
            k_, ((0, 0), (0, 0)),
        )

    _, vjp = jax.vjp(naive, x, kernel)
    dx, dk = vjp(g)
    return dx, dk, jnp.sum(g, axis=(0, 1, 2))


fused_upsample2_conv4.defvjp(_fused_up_fwd, _fused_up_bwd)


def _row_phase_plan(n_in: int, n_out: int, ksize: int, pad: int):
    """Phase descriptors for folding a nearest row-resize into a conv.

    For ``resize_nearest`` rows ``n_in -> n_out`` followed by a ``ksize``-tap
    row conv with ``pad``: output rows repeat with period ``q`` (``n_in/n_out
    = p/q`` reduced), and within a phase the conv's taps hit a fixed set of
    *distinct* source rows. Returns ``(q, p, plans)`` with one plan per
    phase: ``(d0, groups)`` where ``groups[l]`` lists the original kernel
    tap indices merged into distinct source row ``d0 + l``.
    """
    import math

    import numpy as np

    g = math.gcd(n_in, n_out)
    p_num, q = n_in // g, n_out // g
    src = np.floor((np.arange(n_out) + 0.5) * n_in / n_out).astype(int)
    n_conv_out = n_out + 2 * pad - ksize + 1
    plans = []
    for phase in range(q):
        # representative interior output row of this phase
        i = phase if phase + ksize - pad <= n_out else phase  # any rep works
        rel = []
        for a in range(ksize):
            r = i - pad + a
            rel.append(src[r] - p_num * (i // q) if 0 <= r < n_out else src[0] - 1)
        # group consecutive equal taps
        d0 = rel[0]
        groups, cur, cur_rows = [], [0], rel[0]
        for a in range(1, ksize):
            if rel[a] == cur_rows:
                cur.append(a)
            else:
                groups.append((cur_rows, cur))
                cur, cur_rows = [a], rel[a]
        groups.append((cur_rows, cur))
        n_phase = (n_conv_out - phase + q - 1) // q
        plans.append((d0, groups, n_phase))
    return q, p_num, plans


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_row_resize_conv4(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, n_resized_rows: int, n_cols: int
) -> jnp.ndarray:
    """``conv4x4(pad1, resize_nearest(x, (n_resized_rows, n_cols)))`` with the
    ROW duplication folded into per-phase strided convs (columns still resize
    normally). For the proton generator's 35x19 -> 56x30 resize + Conv_1 this
    cuts the row taps from 4 to ~2.9 on average — exact same output.

    Custom VJP: backward differentiates the naive resize+conv form (see
    fused_upsample2_conv4 — same trainability rationale).
    """
    import numpy as np

    b, h_in, w_in, cin = x.shape
    # columns: plain nearest resize (gather)
    col_map = np.floor((np.arange(n_cols) + 0.5) * w_in / n_cols).astype(int)
    xc = x[:, :, col_map, :]  # [B, h_in, n_cols, cin]

    q, p_num, plans = _row_phase_plan(h_in, n_resized_rows, 4, 1)
    n_out_rows = n_resized_rows - 1  # 4-tap, pad 1: n + 2 - 4 + 1
    w = kernel  # [4, 4, cin, cout]

    phase_outs = []
    max_n = max(n for _, _, n in plans)
    for d0, groups, n_phase in plans:
        k_p = jnp.stack([sum(w[a] for a in taps) for _, taps in groups])  # [L,4,cin,cout]
        L = k_p.shape[0]
        pad_t = max(-d0, 0)
        start = max(d0, 0)
        avail = h_in - start
        span = p_num * (n_phase - 1) + L
        pad_b = max(0, span - pad_t - avail)
        xp = xc[:, start:, :, :]
        y = jax.lax.conv_general_dilated(
            jnp.pad(xp, ((0, 0), (pad_t, pad_b), (0, 0), (0, 0))),
            k_p, window_strides=(p_num, 1), padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )[:, :n_phase]
        if n_phase < max_n:  # pad short phases for the interleave reshape
            y = jnp.pad(y, ((0, 0), (0, max_n - n_phase), (0, 0), (0, 0)))
        phase_outs.append(y)

    stacked = jnp.stack(phase_outs, axis=2)  # [B, max_n, q, W', cout]
    out = stacked.reshape(b, max_n * q, stacked.shape[3], stacked.shape[4])
    return out[:, :n_out_rows] + bias


def _fused_rr_fwd(x, kernel, bias, n_resized_rows, n_cols):
    return fused_row_resize_conv4(x, kernel, bias, n_resized_rows, n_cols), (x, kernel)


def _fused_rr_bwd(n_resized_rows, n_cols, res, g):
    x, kernel = res

    def naive(x_, k_):
        return _conv(
            resize_nearest(x_, (n_resized_rows, n_cols)), k_, ((1, 1), (1, 1))
        )

    _, vjp = jax.vjp(naive, x, kernel)
    dx, dk = vjp(g)
    return dx, dk, jnp.sum(g, axis=(0, 1, 2))


fused_row_resize_conv4.defvjp(_fused_rr_fwd, _fused_rr_bwd)


def _quant_per_cout(k: jnp.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns ``(q, s)`` with ``k ~= q * s`` and ``s`` shaped ``[cout]``.
    """
    s = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=tuple(range(k.ndim - 1))) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _quant_act(x: jnp.ndarray, scale=None):
    """Per-tensor symmetric int8 quantization of activations.

    ``scale=None``: dynamic — one max-reduce over the tensor per call, which
    forces XLA to materialize the activation, reduce it, then re-read it for
    the rescale (three HBM passes). ``scale=<scalar>``: static calibrated
    scale — the quantize is pure elementwise and fuses into the producer's
    epilogue (GN/LN + leaky), no reduce round-trip. Calibration captures the
    dynamic maxima via ``fast_generator_apply(amax_out=...)``; values beyond
    the calibrated range clip at +-127 (the following GroupNorm renormalizes
    the surviving error — fidelity is gated in fidelity.py before any static
    configuration is served)."""
    if scale is None:
        s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
        s = jnp.maximum(s, 1e-12)
    else:
        s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _conv_i8(x, k, pad):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


# Round-3 lever A/B on chip (experiments/perf_serve_r3d.py, bulk int8
# B=32768 T=64): f32 dequant 40.4k showers/s vs bf16 dequant 35.8k (-11% —
# at tile granularity the decode is VMEM-resident, so the bandwidth saving
# never materializes and the extra converts cost fusion); int8 Conv_2
# 40.43k vs bf16 Conv_2 40.40k (kept: neutral throughput, frees MXU time).
# DEQUANT_DTYPE None follows the measured default (f32); the toggles stay
# for re-measurement.
DEQUANT_DTYPE = None
INT8_CONV2 = True

# Conv formulation selectors for the int8 decode (round-3 measured,
# experiments/perf_mm_r3.py + perf_naive_r3.py). The tile-level microbench
# showed XLA's single naive 4x4 int8 conv on the materialized 56x30 resized
# grid runs at 35.6% int8-MXU utilization vs 11.4% for the 8 strided
# row-phase convs of fused_row_resize_conv4_int8 — 2.3x faster despite
# 1.38x more MACs (the "FLOP-reduced" phase form is a TPU pessimization:
# tiny strided outputs defeat XLA's conv tiling). Conv_0's parity-phase
# form keeps a 2.52x MAC reduction at comparable utilization and stays.
# Values: "phase"/"folded" = phase-decomposed (round-2 form),
# "naive" = materialize upsample/resize in int8, one plain conv.
INT8_CONV0_IMPL = "phase"
INT8_CONV1_IMPL = "naive"  # +2.2% bulk (41.3k vs 40.4k at T=64, perf_naive_r3)


def _dq_dtype(x):
    del x
    if DEQUANT_DTYPE is not None:
        return DEQUANT_DTYPE
    return jnp.float32


def conv3x3_int8(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, act_scale=None
) -> jnp.ndarray:
    """Plain pad-1 conv on the int8 MXU (per-cout weight scales, dynamic
    per-tensor activation scale) — used for Conv_2 in the int8 serving
    decode; a GroupNorm follows, so quantization error is renormalized
    exactly like Conv_0/Conv_1's."""
    xq, sx = _quant_act(x, act_scale)
    kq, sk = _quant_per_cout(kernel)
    dq = _dq_dtype(x)
    y = _conv_i8(xq, kq, ((1, 1), (1, 1)))
    return (y.astype(dq) * (sk * sx).astype(dq) + bias.astype(dq)).astype(x.dtype)


def fused_upsample2_conv4_int8(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, act_scale=None
) -> jnp.ndarray:
    """int8 MXU variant of :func:`fused_upsample2_conv4`.

    The four parity-phase kernels are quantized per output channel; the
    activation gets one dynamic per-tensor scale. v5e int8 conv throughput
    measured 1.8x bf16 (experiments/perf_study2_r2.py) — this halves the
    dominant decode cost at serving time. Weight quantization happens inline
    (tiny tensors; loop-invariant, XLA hoists it out of bulk scan loops).
    """
    w = kernel
    k_er = jnp.stack([w[0], w[1] + w[2], w[3]])
    k_or = jnp.stack([w[0] + w[1], w[2] + w[3]])

    def split_cols(k):
        ke = jnp.stack([k[:, 0], k[:, 1] + k[:, 2], k[:, 3]], axis=1)
        ko = jnp.stack([k[:, 0] + k[:, 1], k[:, 2] + k[:, 3]], axis=1)
        return ke, ko

    k_ee, k_eo = split_cols(k_er)
    k_oe, k_oo = split_cols(k_or)

    xq, sx = _quant_act(x, act_scale)
    # f32 dequant/interleave: bf16 here measured -11% bulk throughput
    # (see DEQUANT_DTYPE note above) — the tile-resident decode is not
    # bandwidth-bound, so the narrower dtype only costs converts.
    dq = _dq_dtype(x)

    def qconv(k, pad):
        kq, sk = _quant_per_cout(k)
        y = _conv_i8(xq, kq, pad)
        return y.astype(dq) * (sk * sx).astype(dq)

    y_ee = qconv(k_ee, ((1, 1), (1, 1)))
    y_eo = qconv(k_eo, ((1, 1), (0, 0)))
    y_oe = qconv(k_oe, ((0, 0), (1, 1)))
    y_oo = qconv(k_oo, ((0, 0), (0, 0)))

    rows_even = _interleave(y_ee, y_eo, axis=2)
    rows_odd = _interleave(y_oe, y_oo, axis=2)
    out = _interleave(rows_even, rows_odd, axis=1)
    return (out + bias.astype(dq)).astype(x.dtype)


def fused_row_resize_conv4_int8(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, n_resized_rows: int,
    n_cols: int, act_scale=None,
) -> jnp.ndarray:
    """int8 MXU variant of :func:`fused_row_resize_conv4` (same phase plan,
    quantized per-phase kernels, one dynamic activation scale)."""
    import numpy as np

    b, h_in, w_in, cin = x.shape
    col_map = np.floor((np.arange(n_cols) + 0.5) * w_in / n_cols).astype(int)
    xc = x[:, :, col_map, :]
    xq, sx = _quant_act(xc, act_scale)
    # f32 dequant/stack (see fused_upsample2_conv4_int8's DEQUANT note).
    dq = _dq_dtype(x)

    q, p_num, plans = _row_phase_plan(h_in, n_resized_rows, 4, 1)
    n_out_rows = n_resized_rows - 1
    w = kernel

    phase_outs = []
    max_n = max(n for _, _, n in plans)
    for d0, groups, n_phase in plans:
        k_p = jnp.stack([sum(w[a] for a in taps) for _, taps in groups])
        kq, sk = _quant_per_cout(k_p)
        L = kq.shape[0]
        pad_t = max(-d0, 0)
        start = max(d0, 0)
        avail = h_in - start
        span = p_num * (n_phase - 1) + L
        pad_b = max(0, span - pad_t - avail)
        xp = xq[:, start:, :, :]
        y = jax.lax.conv_general_dilated(
            jnp.pad(xp, ((0, 0), (pad_t, pad_b), (0, 0), (0, 0))),
            kq, window_strides=(p_num, 1), padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )[:, :n_phase]
        y = y.astype(dq) * (sk * sx).astype(dq)
        if n_phase < max_n:
            y = jnp.pad(y, ((0, 0), (0, max_n - n_phase), (0, 0), (0, 0)))
        phase_outs.append(y)

    stacked = jnp.stack(phase_outs, axis=2)
    out = stacked.reshape(b, max_n * q, stacked.shape[3], stacked.shape[4])
    return (out[:, :n_out_rows] + bias.astype(dq)).astype(x.dtype)


def upsample2_conv4_int8_naive(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, act_scale=None
) -> jnp.ndarray:
    """Naive int8 counterpart of :func:`fused_upsample2_conv4_int8`:
    materialize the nearest-2x upsample on the QUANTIZED activations (int8
    repeat — cheap) and run one plain 4x4 conv on the int8 MXU. 2.52x the
    phase form's MACs but a single regular conv XLA tiles well; kept for
    in-bulk A/B (experiments/perf_naive_r3.py)."""
    xq, sx = _quant_act(x, act_scale)
    b, h, w, c = xq.shape
    xu = jnp.repeat(jnp.repeat(xq, 2, axis=1), 2, axis=2)  # [B,2H,2W,C]
    kq, sk = _quant_per_cout(kernel)
    dq = _dq_dtype(x)
    y = _conv_i8(xu, kq, ((1, 1), (1, 1)))  # [B,2H-1,2W-1,cout]
    return (y.astype(dq) * (sk * sx).astype(dq) + bias.astype(dq)).astype(x.dtype)


def resize_conv4_int8_naive(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, n_resized_rows: int,
    n_cols: int, act_scale=None,
) -> jnp.ndarray:
    """Naive int8 counterpart of :func:`fused_row_resize_conv4_int8`:
    materialize the nearest resize as an int8 row/col gather and run ONE
    plain 4x4 pad-1 conv on the int8 MXU.

    Measured (experiments/perf_mm_r3.py, tile B=64 on chip): 762 us/op at
    35.6% int8-MXU utilization vs 1735 us at 11.4% for the folded row-phase
    form — the single regular conv wins 2.3x despite 1.38x more MACs.
    Quantization: same per-tensor activation scale (every source pixel
    appears in the nearest-resize, so the max is unchanged); weights are
    quantized per-cout on the ORIGINAL kernel (the folded path quantizes
    merged per-phase kernels — both are valid roundings; fidelity is gated
    in BENCH_LOG before production use)."""
    import numpy as np

    b, h_in, w_in, cin = x.shape
    xq, sx = _quant_act(x, act_scale)
    row_map = np.floor((np.arange(n_resized_rows) + 0.5) * h_in / n_resized_rows).astype(int)
    col_map = np.floor((np.arange(n_cols) + 0.5) * w_in / n_cols).astype(int)
    xr = xq[:, row_map][:, :, col_map]  # int8 nearest resize
    kq, sk = _quant_per_cout(kernel)
    dq = _dq_dtype(x)
    y = _conv_i8(xr, kq, ((1, 1), (1, 1)))  # [B, n_resized_rows-1, n_cols-1, cout]
    return (y.astype(dq) * (sk * sx).astype(dq) + bias.astype(dq)).astype(x.dtype)


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def _layer_norm(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["scale"] + p["bias"]


def _group_norm(x, p, channels):
    g = group_norm_groups(channels, 32)
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, g, c // g)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + 1e-6)
    return xg.reshape(b, h, w, c) * p["scale"] + p["bias"]


def fast_generator_apply(
    params: Any, noise: jnp.ndarray, cond: jnp.ndarray, int8: bool = False,
    int8_backend: str = "xla", act_scales=None, amax_out=None,
) -> jnp.ndarray:
    """Inference forward of ``zdcsim.models.proton.Generator`` with the fused
    upsample+conv rewrite, from the unmodified parameter tree.

    ``int8=True`` runs the two dominant convs (Conv_0/Conv_1 — ~88% of the
    decode FLOPs) on the int8 MXU path (per-channel weight scales, dynamic
    per-tensor activation scale; measured 1.8x conv throughput on v5e). The
    following GroupNorms renormalize scale, so the quantization error that
    survives is shape noise only — fidelity impact is measured in
    BENCH_LOG.md before this is used for any physics claim.

    ``act_scales``: optional dict ``{"conv0","conv1","conv2"} -> f32 scalar``
    of STATIC calibrated activation scales for the XLA int8 path — each
    quantize becomes pure elementwise (no per-call max-reduce; see
    ``_quant_act``). ``amax_out``: pass a dict to additionally record the
    max-abs of each quant-site input under the same keys (the calibration
    capture — works in any precision mode).

    ``int8_backend="pallas"`` swaps the MLP LayerNorm epilogue and Conv_0
    for the fused Pallas kernels (zdcsim/ops/pallas_decode.py): LN + leaky +
    PER-SAMPLE int8 quant in one HBM pass, then all four parity-phase convs
    + dequant + interleave in one kernel. Exactness vs this XLA path is
    tested in tests/test_pallas_decode.py; per-sample activation scales are
    finer than the per-tensor scale used here.
    """
    p = params
    # Backend granularity (measured on chip, experiments/perf_serve_r3.py):
    # kernel B (fused all-phase Conv_0) wins 1.8x over the XLA int8 phases,
    # but kernels C+D (GN bridge + row-phase Conv_1) lose ~60 ms/4096 to
    # their XLA counterparts — so "pallas_ab" (A+B fused LN-quant + Conv_0,
    # XLA for the rest) is the production point; "pallas" = all four.
    use_pallas_ab = int8 and int8_backend in ("pallas", "pallas_ab")
    use_pallas_cd = int8 and int8_backend == "pallas"
    use_fused = int8 and int8_backend == "fused"
    use_fused_front = int8 and int8_backend == "fused_front"
    scales = act_scales or {}

    def _site(t, name):
        # calibration capture: record this quant site's input max-abs
        if amax_out is not None:
            amax_out[name] = jnp.max(jnp.abs(t.astype(jnp.float32)))
        return t
    x = jnp.concatenate([noise, cond], axis=1)
    # MLP stays bf16: its cost is the 92160-wide LayerNorm traffic, not the
    # matmul — int8-ing it measured neutral-to-negative (BENCH_LOG round 2).
    bp0 = p["MLPBlock_0"]
    x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
    x = _layer_norm(x, bp0["LayerNorm_0"])
    x = _leaky(x)
    bp1 = p["MLPBlock_1"]
    x = x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]
    if use_fused:
        # Round-3: the ENTIRE post-MLP decode in ONE Pallas kernel — a
        # single custom-call boundary per dispatch tile, all intermediates
        # VMEM-resident (see zdcsim/ops/pallas_decode_fused.py for the
        # profiling that motivates it). Input is the pre-LN Dense_1 output.
        from zdcsim.ops import pallas_decode_fused as pdf

        return pdf.fused_decode_from_params(
            p, x, block_rows=pdf.FUSED_BLOCK_ROWS
        )[..., None].astype(noise.dtype)
    if use_fused_front:
        # Front half (LN -> Conv_0 phases -> GN0 -> per-sample quant ->
        # int8 nearest resize) as ONE Pallas kernel (compile-feasible,
        # unlike the full fused kernel — see fused_decode_front's
        # docstring); Conv_1 = XLA's plain 4x4 int8 conv on the kernel's
        # int8 resized-grid output (the best-measured Conv_1 form,
        # resize_conv4_int8_naive) with the front's per-sample scale.
        from zdcsim.ops import pallas_decode_fused as pdf

        q, s = pdf.fused_decode_front_from_params(
            p, x, block_rows=pdf.FUSED_BLOCK_ROWS
        )
        kq, sk = _quant_per_cout(p["Conv_1"]["kernel"])
        dq = jnp.float32 if DEQUANT_DTYPE is None else DEQUANT_DTYPE
        y = _conv_i8(q, kq, ((1, 1), (1, 1)))  # [B, 55, 29, 128]
        x = (
            y.astype(dq)
            * (sk[None, None, None, :].astype(dq) * s[:, None, None, None].astype(dq))
            + p["Conv_1"]["bias"].astype(dq)
        ).astype(noise.dtype)
    elif use_pallas_ab:
        from zdcsim.ops.pallas_decode import ln_leaky_rowquant, up2_conv4_int8

        xq, sx = ln_leaky_rowquant(
            x, bp1["LayerNorm_0"]["scale"], bp1["LayerNorm_0"]["bias"]
        )
        x = up2_conv4_int8(
            xq.reshape(-1, 18, 10, 512), sx,
            p["Conv_0"]["kernel"], p["Conv_0"]["bias"], out_dtype=noise.dtype,
        )
    else:
        x = _layer_norm(x, bp1["LayerNorm_0"])
        x = _leaky(x)
        # base channel count from the tree (512 at width=1; scaled students
        # share the same layout — see Generator.width)
        x = x.reshape(-1, 18, 10, bp1["Dense_0"]["kernel"].shape[1] // (18 * 10))

        # upsample x2 + Conv_0 4x4 pad1 -> fused parity convs (35x19x256)
        x = _site(x, "conv0")
        if int8 and INT8_CONV0_IMPL == "naive":
            x = upsample2_conv4_int8_naive(
                x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                act_scale=scales.get("conv0"),
            )
        elif int8:
            x = fused_upsample2_conv4_int8(
                x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                act_scale=scales.get("conv0"),
            )
        else:
            x = fused_upsample2_conv4(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"])
    if use_fused_front:
        pass  # GN0 / resize / Conv_1 all happened in the front branch
    elif use_pallas_cd:
        # GN + leaky + per-sample requant in one pass (kernel C), int8
        # column gather (cheap XLA), then the row-phase conv on the int8
        # MXU with fused dequant + interleave (kernel D).
        import numpy as np

        from zdcsim.ops.pallas_decode import gn_leaky_rowquant, row_resize_conv4_int8

        gn0 = p["GroupNorm2d_0"]["GroupNorm_0"]
        xq1, sx1 = gn_leaky_rowquant(x, gn0["scale"], gn0["bias"], groups=32)
        col_map = np.floor((np.arange(30) + 0.5) * 19 / 30).astype(int)
        x = row_resize_conv4_int8(
            xq1[:, :, col_map, :], sx1, p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
            56, out_dtype=noise.dtype,
        )[:, :, :29]
    else:
        x = _group_norm(x, p["GroupNorm2d_0"]["GroupNorm_0"], x.shape[-1])
        x = _leaky(x)

        # resize to 56x30 + Conv_1 4x4 pad1 (55x29x128): int8 default is the
        # naive conv on the materialized int8 resize (2.3x the folded
        # row-phase form on chip — see resize_conv4_int8_naive docstring)
        x = _site(x, "conv1")
        if int8 and INT8_CONV1_IMPL == "naive":
            x = resize_conv4_int8_naive(
                x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30,
                act_scale=scales.get("conv1"),
            )
        elif int8:
            x = fused_row_resize_conv4_int8(
                x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30,
                act_scale=scales.get("conv1"),
            )
        else:
            x = fused_row_resize_conv4(x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 56, 30)
    x = _group_norm(x, p["GroupNorm2d_1"]["GroupNorm_0"], x.shape[-1])
    x = _leaky(x)

    x = _site(x, "conv2")
    if int8 and INT8_CONV2:
        x = conv3x3_int8(
            x, p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
            act_scale=scales.get("conv2"),
        )
    else:
        x = _conv(x, p["Conv_2"]["kernel"], ((1, 1), (1, 1)))
        x = x + p["Conv_2"]["bias"]
    x = _group_norm(x, p["GroupNorm2d_2"]["GroupNorm_0"], x.shape[-1])
    x = _leaky(x)

    x = _conv(x, p["Conv_3"]["kernel"], ((1, 1), (1, 1)))
    x = x + p["Conv_3"]["bias"]
    return jax.nn.relu(x)
