"""ONE fused Pallas TPU kernel for the whole int8 proton serving decode.

Round-3 profiling of the production bulk program (BENCH_LOG.md; captured
with jax.profiler + experiments/xplane_parse.py) showed ~50% of bulk
serving runtime is NOT MXU work: 31% VPU loop fusions (LN/GN statistics,
quant/dequant, interleaves) and 16% pure layout-formatting copies between
fusion boundaries, on top of conv fusions at ~60% int8 utilization. The
round-2/3 per-op Pallas kernels (zdcsim/ops/pallas_decode.py, kernels
A-D) could not recover this because every kernel boundary re-pays XLA
relayout: the all-Pallas decode measured SLOWER in bulk (22.4k vs 40.4k
showers/s).

This module instead runs the ENTIRE post-MLP decode — LayerNorm ->
LeakyReLU -> int8 quant -> Conv_0 (parity phases) -> GN -> Conv_1 (on the
materialized nearest-resize) -> GN -> Conv_2 -> GN -> Conv_3 -> ReLU
[-> expm1] — as ONE ``pallas_call``: a single custom-call boundary per
dispatch tile, all intermediates VMEM-resident, zero XLA-side layout
copies. Reference semantics: the serving forward of
``zdcsim.models.proton.Generator`` (expertsim/models/proton/generator.py:
5-53 "Generator-v5-bigkernel-res56x30"), already re-derived in
``zdcsim.models.proton_fast.fast_generator_apply``.

V2 — MASKLESS PADDED-GRID TAPS. The first chip measurement of this
kernel (v1, flat-shift halo + per-tap iota validity masks) ran 49.2
us/sample at tb=4 — 2x SLOWER than the XLA int8 path (24.6) — and the
tb=8 compile killed the remote compile helper. The cost model explains
both: 45 taps x ``jnp.where(ok, xs, 0)`` on [m, C] int8 operands is
~40M VPU select-elements per sample block (conv1 alone: 16 x [6720,
256]), swamping the ~4 us/sample of MXU work, and the unrolled selects
blow up the Mosaic program. V2 stores every conv input on a true
2D-zero-padded grid in VMEM (halo row top / 2 bottom, halo col left /
2 right on the 56x30 grid; 1 all around the 18x10 MLP grid) so EVERY
tap is a plain contiguous int8 slice feeding the MXU — no masks at
all. Outputs are computed at every padded position (+16% MACs on the
G grid, +33% on the tiny conv0 grid) and garbage positions are zeroed
ONCE per stage by a single iota validity multiply, which also keeps
them out of the GroupNorm statistics and keeps the halos of the NEXT
stage's input zero.

Techniques (measured in this repo, see pallas_decode.py docstrings):
- convs as per-tap int8 ``dot_general`` on a flat [M, C] zero-halo VMEM
  scratch (kernel B pattern, minus the masks — see above);
- GroupNorm statistics as MXU contractions against a 0/1 group-membership
  matrix — no lane-crossing reshapes (kernel C pattern);
- Conv_0's four parity phases (proton_fast.fused_upsample2_conv4 algebra:
  2.52x fewer MACs than the naive upsampled conv) interleaved at the
  value level (stack + reshape, the proton_fast._interleave trick);
- the 35x19 -> 56x30 nearest resize done on int8 values in VMEM: columns
  as 30 static gathers, rows via the periodic 8-outputs-per-5-sources
  pattern (8 strided slices + one stack/reshape interleave);
- Conv_1/2/3 all computed on the uniform padded grid with invalid
  positions kept at zero so they double as conv padding (Conv_1's
  valid output is 55x29; Conv_3's 2x2 pad-1 conv then lands exactly
  back on 56x30, matching the module forward).

Quantization: per-sample activation scales at every int8 stage (finer
than the XLA path's per-tensor scales), per-cout weight scales; Conv_3
runs in f32 (tiny). Exactness vs the f32 path is tolerance-tested in
tests/test_pallas_fused.py (interpret mode on CPU); physics fidelity is
gated on-chip in BENCH_LOG.md before production use.

FINAL CHIP VERDICT (BENCH_LOG.md "Round-3 finale"): NOT production.
v2's full kernel is compile-infeasible (the conv1..3 tail SIGKILLs the
Mosaic compile helper at tb=4 and tb=8 — experiments/fused_bisect4_r3.py
bisect: stages 1-6 compile in 46 s, +conv1 303 s); the compile-feasible
front half (:func:`fused_decode_front`, serving precision
``int8_fused_front``) measured 33.1 us/sample end-to-end vs the XLA int8
path's 26.1 — the sublane-misaligned int8 tap slices execute at ~12% of
int8-MXU peak on this Mosaic version, which outweighs the fusion saving
the profiler identified. Both kernels stay exactness-tested as the
measured record and as ready probes for future Mosaic versions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zdcsim.ops.pallas_decode import _COMPILER_PARAMS, _is_tpu, _quant_phases

# conv0 operates on the 18x10x512 MLP grid; its four parity phases fill
# the 35x19 grid; conv1..3 run on the 56x30 resized grid.
H0, W0, C0 = 18, 10, 512
H1, W1, C1 = 35, 19, 256  # conv0 output (valid grid)
HG, WG = 56, 30  # resized / final grid
C2, C3 = 128, 64

# Padded-grid geometry (v2). Conv0 phase offsets are within {-1,0,1}:
# 1-cell halo all around the MLP grid. Conv_1 is a 4x4 with offsets
# {-1..2}: 1 top/left + 2 bottom/right halo around the 56x30 grid —
# conv2 (3x3) and conv3 (2x2) offsets are subsets.
H0P, W0P = H0 + 2, W0 + 2  # 20 x 12
HGP, WGP = HG + 3, WG + 3  # 59 x 33
_PAD0 = 32  # conv0 flat halo (|dr*W0P + dc| <= 13)
_PADG = 128  # conv1..3 flat halo (|(a-1)*WGP + (c-1)| <= 68)

_PHASE_OFFSETS = {
    "ee": [(a - 1, b - 1) for a in range(3) for b in range(3)],
    "eo": [(a - 1, b) for a in range(3) for b in range(2)],
    "oe": [(a, b - 1) for a in range(2) for b in range(3)],
    "oo": [(a, b) for a in range(2) for b in range(2)],
}
_PHASES = ("ee", "eo", "oe", "oo")
# Rows/cols of the padded conv0 grid each phase actually uses (the four
# phases partition the 35x19 grid: 18x10 + 18x9 + 17x10 + 17x9 = 665).
_PHASE_USED = {"ee": (H0, W0), "eo": (H0, W0 - 1),
               "oe": (H0 - 1, W0), "oo": (H0 - 1, W0 - 1)}

# Sample-block size per grid step. Settable by perf experiments;
# fast_generator_apply(int8_backend="fused") reads it at trace time.
FUSED_BLOCK_ROWS = 8

def _dbg_out(out_ref, tb, hg, wg, *vals):
    """Debug-only early-out (``fused_decode(debug_stop_stage=N)``): write a
    per-sample reduction of the stage-N intermediates to out_ref so chip
    compile failures inside the Mosaic pipeline can be bisected
    (experiments/fused_bisect_r3.py)."""
    acc = jnp.zeros((tb,), jnp.float32)
    for v in vals:
        acc = acc + jnp.sum(
            v.astype(jnp.float32).reshape(tb, -1), axis=1
        )
    out_ref[:] = jnp.broadcast_to(acc.reshape(tb, 1, 1), (tb, hg, wg))

_ROW_MAP = np.floor((np.arange(HG) + 0.5) * H1 / HG).astype(int)
_COL_MAP = np.floor((np.arange(WG) + 0.5) * W1 / WG).astype(int)
# rows are periodic: output rows k::8 <- source rows _ROW_PAT[k]::5
_ROW_PAT = [int(_ROW_MAP[k]) for k in range(8)]
assert all(
    int(_ROW_MAP[g * 8 + k]) == _ROW_PAT[k] + 5 * g
    for g in range(HG // 8) for k in range(8)
)


def _quant_cout(k: jnp.ndarray):
    s = jnp.maximum(
        jnp.max(jnp.abs(k.astype(jnp.float32)), axis=tuple(range(k.ndim - 1))) / 127.0,
        1e-12,
    )
    q = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def _gmat(c: int, groups: int) -> jnp.ndarray:
    return jnp.asarray(
        (jnp.arange(c)[:, None] // (c // groups)) == jnp.arange(groups)[None, :],
        jnp.float32,
    )


def _interleave_vals(even, odd, axis):
    """proton_fast._interleave on kernel values: length 2E-1."""
    pad = [(0, 0)] * even.ndim
    pad[axis] = (0, 1)
    stacked = jnp.stack([even, jnp.pad(odd, pad)], axis=axis + 1)
    shape = list(even.shape)
    shape[axis] = 2 * even.shape[axis]
    out = stacked.reshape(shape)
    idx = [slice(None)] * even.ndim
    idx[axis] = slice(0, 2 * even.shape[axis] - 1)
    return out[tuple(idx)]


def _valid01(m: int, wp: int, hp: int, i_lim: tuple, j_lim: tuple):
    """[m, 1] f32 0/1 mask for padded-grid positions with row in
    ``i_lim`` = (lo, hi) and col in ``j_lim`` (both inclusive)."""
    midx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    i = (midx // wp) % hp
    j = midx % wp
    ok = ((i >= i_lim[0]) & (i <= i_lim[1])
          & (j >= j_lim[0]) & (j <= j_lim[1]))
    return ok.astype(jnp.float32)


def _gn_leaky(y, gmat, scale, bias, count, valid):
    """GroupNorm + LeakyReLU via MXU group contractions (kernel C pattern).

    y: [TB, P, C] with garbage positions ALREADY ZEROED (``valid`` is the
    [TB, P, 1]-broadcastable 0/1 mask that zeroed them); ``count`` = valid
    positions x channels-per-group. The normalized output is re-masked
    (normalization shifts zeros to -mu*inv*scale+bias).

    Stats are position-sums (single-axis reduce on 3D, which Mosaic
    handles) followed by a 2D [TB,C]@[C,G] matmul — NOT one einsum over
    (positions, channels): multi-axis partial reductions on rank>=3
    SIGABRT this Mosaic version (experiments/fused_bisect3_r3.py)."""
    y3 = y.reshape(y.shape[0], -1, y.shape[-1])
    s1 = jnp.sum(y3, axis=1) @ gmat
    s2 = jnp.sum(y3 * y3, axis=1) @ gmat
    mu_g = s1 / count
    var_g = jnp.maximum(s2 / count - mu_g * mu_g, 0.0)
    mu_c = jnp.einsum("bg,cg->bc", mu_g, gmat)
    inv_c = jnp.einsum("bg,cg->bc", jax.lax.rsqrt(var_g + 1e-6), gmat)
    bshape = (y.shape[0],) + (1,) * (y.ndim - 2) + (y.shape[-1],)
    out = (y - mu_c.reshape(bshape)) * inv_c.reshape(bshape)
    out = out * scale + bias
    out = jnp.where(out >= 0, out, 0.1 * out)
    return out * valid


def _rowquant(y, tb):
    """Per-sample symmetric int8 quant; y: [TB, ..., C] -> (q, s[TB])."""
    m = jnp.max(jnp.abs(y.reshape(tb, -1)), axis=1)
    s = jnp.maximum(m / 127.0, 1e-12)
    sb = s.reshape((tb,) + (1,) * (y.ndim - 1))
    q = jnp.clip(jnp.round(y / sb), -127, 127).astype(jnp.int8)
    return q, s


def _front_stages(
    tb, stop,
    x_ref, lns_ref, lnb_ref,
    k0_ref, s0_ref, b0_ref, g0s_ref, g0b_ref,
    gm1_ref, xpad0,
):
    """Stages 1-6 (LN -> conv0 phases -> per-phase GN0+quant -> interleave
    -> int8 nearest resize), shared by the full kernel and the front
    kernel. Returns ``(xr, s1a, dbg)``: the int8 resized grid
    [TB, 56, 30, C1], its per-sample dequant scale [TB], and — when
    ``stop`` names a stage <= 6 — the tuple of that stage's intermediates
    for :func:`_dbg_out` (``xr``/``s1a`` are then None)."""
    m0 = tb * H0P * W0P

    # ---- LayerNorm + LeakyReLU + per-sample int8 quant (kernel A) ----
    # Flattened to 2D [TB, 92160]: axis-(1,2) reductions on the 3D
    # block SIGABRT Mosaic (fused_bisect3); 2D axis-1 reduces are fine.
    x = x_ref[:].astype(jnp.float32).reshape(tb, H0 * W0 * C0)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=1, keepdims=True)
    z = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    z = z * lns_ref[:].astype(jnp.float32).reshape(1, -1) \
        + lnb_ref[:].astype(jnp.float32).reshape(1, -1)
    z = jnp.where(z >= 0, z, 0.1 * z)
    mx = jnp.max(jnp.abs(z), axis=1, keepdims=True)
    sx = jnp.maximum(mx / 127.0, 1e-12)  # [TB, 1]
    xq = jnp.clip(jnp.round(z / sx), -127, 127).astype(jnp.int8)
    if stop == 1:
        return None, None, (xq,)

    # zero-halo padded write: taps below need no validity masks
    xq4 = jnp.pad(
        xq.reshape(tb, H0, W0, C0), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    xpad0[:_PAD0, :] = jnp.zeros((_PAD0, C0), jnp.int8)
    xpad0[_PAD0:_PAD0 + m0, :] = xq4.reshape(m0, C0)
    xpad0[_PAD0 + m0:, :] = jnp.zeros((_PAD0, C0), jnp.int8)

    # ---- Conv_0: parity-phase taps, maskless contiguous slices ----
    bias0 = b0_ref[0].astype(jnp.float32)
    sxc = sx.reshape(tb, 1)

    phase_vals = []
    tap = 0
    for name in _PHASES:
        acc = jnp.zeros((m0, C1), jnp.int32)
        for (dr, dc) in _PHASE_OFFSETS[name]:
            sft = dr * W0P + dc
            acc = acc + jax.lax.dot_general(
                xpad0[_PAD0 + sft:_PAD0 + sft + m0, :], k0_ref[tap],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            tap += 1
        p = len(phase_vals)
        skp = s0_ref[p].astype(jnp.float32)  # [C1]
        val = acc.astype(jnp.float32) * skp[None, :]
        val = val.reshape(tb, H0P * W0P, C1) * sxc[:, :, None]
        val = val + bias0[None, None, :]
        # one validity multiply per phase: kills halo garbage (incl.
        # the bias just added there) and the phase's unused tail
        # row/col, so whole-tensor sums give exact GN0 statistics
        hu, wu = _PHASE_USED[name]
        vmask = _valid01(H0P * W0P, W0P, H0P, (1, hu), (1, wu))
        phase_vals.append(val * vmask[None, :, :])

    if stop == 2:
        return None, None, tuple(phase_vals)
    # ---- GN0 + LeakyReLU + per-sample quant, PER PHASE ----
    # The four parity phases PARTITION the 35x19 grid, so GN0 group
    # sums accumulate exactly from the (masked) phase values and each
    # phase is normalized + quantized to int8 BEFORE the interleave:
    # the full-grid f32 y0 is never materialized and the
    # interleave/resize shuffles move int8, not f32.
    gm1 = gm1_ref[:]
    # Channel-sums per phase (3D axis-1 reduce) then one 2D matmul
    # against the group matrix — multi-axis einsum reductions on
    # rank-4 SIGABRT Mosaic (see _gn_leaky).
    cs = cs2 = 0.0
    for v in phase_vals:
        cs = cs + jnp.sum(v, axis=1)
        cs2 = cs2 + jnp.sum(v * v, axis=1)
    s1s = cs @ gm1
    s2s = cs2 @ gm1
    cnt0 = float(H1 * W1 * (C1 // 32))
    mu_g = s1s / cnt0
    var_g = jnp.maximum(s2s / cnt0 - mu_g * mu_g, 0.0)
    mu_c = jnp.einsum("bg,cg->bc", mu_g, gm1)[:, None, :]
    inv_c = jnp.einsum(
        "bg,cg->bc", jax.lax.rsqrt(var_g + 1e-6), gm1
    )[:, None, :]
    g0s = g0s_ref[:].astype(jnp.float32).reshape(1, 1, C1)
    g0b = g0b_ref[:].astype(jnp.float32).reshape(1, 1, C1)

    def _n0(v, name):
        o = (v - mu_c) * inv_c * g0s + g0b
        o = jnp.where(o >= 0, o, 0.1 * o)
        # re-mask: normalization shifted the zeroed positions
        hu, wu = _PHASE_USED[name]
        return o * _valid01(H0P * W0P, W0P, H0P, (1, hu), (1, wu))[None]

    norm_vals = [_n0(v, n) for v, n in zip(phase_vals, _PHASES)]
    # shared per-sample quant scale (garbage positions are zero)
    m = jnp.zeros((tb,), jnp.float32)
    for n in norm_vals:
        m = jnp.maximum(m, jnp.max(jnp.abs(n.reshape(tb, -1)), axis=1))
    s1a = jnp.maximum(m / 127.0, 1e-12)  # [TB]
    sb0 = s1a.reshape(tb, 1, 1)
    qs = [
        jnp.clip(jnp.round(n / sb0), -127, 127)
        .astype(jnp.int8).reshape(tb, H0P, W0P, C1)
        for n in norm_vals
    ]
    # interior slices (drop halo + phase-unused tails)
    n_ee = qs[0][:, 1:1 + H0, 1:1 + W0]
    n_eo = qs[1][:, 1:1 + H0, 1:W0]
    n_oe = qs[2][:, 1:H0, 1:1 + W0]
    n_oo = qs[3][:, 1:H0, 1:W0]
    if stop == 3:
        return None, None, (n_ee, n_eo, n_oe, n_oo)
    rows_even = _interleave_vals(n_ee, n_eo, 2)  # [TB,18,19,C1]
    rows_odd = _interleave_vals(n_oe, n_oo, 2)  # [TB,17,19,C1]
    q1 = _interleave_vals(rows_even, rows_odd, 1)  # [TB,35,19,C1] int8
    if stop == 4:
        return None, None, (q1,)

    # ---- nearest resize 35x19 -> 56x30 (int8, value level) ----
    qc = jnp.stack([q1[:, :, int(c), :] for c in _COL_MAP], axis=2)
    if stop == 5:
        return None, None, (qc,)
    # rows: out k::8 <- src _ROW_PAT[k]::5 (7 groups x 8 phases = 56).
    # Static indexing on a [TB, 7, 5, ...] reshape, NOT qc[:, pat::5]:
    # jax 0.9 lowers strided basic indexing to iota+gather, which
    # Mosaic rejects for >2D operands ("Only 2D gather is supported").
    qg = qc.reshape(tb, H1 // 5, 5, WG, C1)
    row_phases = jnp.stack(
        [qg[:, :, _ROW_PAT[k], :, :] for k in range(8)], axis=2
    )  # [TB, 7, 8, 30, C1]
    xr = row_phases.reshape(tb, HG, WG, C1)
    return xr, s1a, None


def _make_fused_kernel(tb: int, apply_expm1: bool, stop: int | None = None):
    mg = tb * HGP * WGP

    def kernel(
        x_ref, lns_ref, lnb_ref,
        k0_ref, s0_ref, b0_ref, g0s_ref, g0b_ref,
        k1_ref, s1_ref, b1_ref, g1s_ref, g1b_ref,
        k2_ref, s2_ref, b2_ref, g2s_ref, g2b_ref,
        k3_ref, b3_ref,
        gm1_ref, gm2_ref, gm3_ref,
        out_ref,
        xpad0, xpadg, y1q, y2q,
    ):
        xr, s1a, dbg = _front_stages(
            tb, stop, x_ref, lns_ref, lnb_ref,
            k0_ref, s0_ref, b0_ref, g0s_ref, g0b_ref, gm1_ref, xpad0,
        )
        if dbg is not None:
            return _dbg_out(out_ref, tb, HG, WG, *dbg)
        # zero-halo padded write onto the conv1..3 grid
        xrp = jnp.pad(xr, ((0, 0), (1, 2), (1, 2), (0, 0)))
        xpadg[:_PADG, :] = jnp.zeros((_PADG, C1), jnp.int8)
        xpadg[_PADG:_PADG + mg, :] = xrp.reshape(mg, C1)
        xpadg[_PADG + mg:, :] = jnp.zeros((_PADG, C1), jnp.int8)
        if stop == 6:
            return _dbg_out(out_ref, tb, HG, WG, xr)

        # valid conv output on the padded grid: rows 1..55, cols 1..29
        # (= the 55x29 valid positions; the tail row/col of the 56x30
        # grid stays zero, acting as padding exactly like the XLA path)
        okg = _valid01(HGP * WGP, WGP, HGP, (1, HG - 1), (1, WG - 1))[None]
        gn_cnt2 = float((HG - 1) * (WG - 1) * (C2 // 32))
        gn_cnt3 = float((HG - 1) * (WG - 1) * (C3 // 32))

        # ---- Conv_1 (naive 16-tap on the resized grid, maskless) ----
        bias1 = b1_ref[0].astype(jnp.float32)
        acc1 = jnp.zeros((mg, C2), jnp.int32)
        tap = 0
        for a in range(4):
            for c in range(4):
                sft = (a - 1) * WGP + (c - 1)
                acc1 = acc1 + jax.lax.dot_general(
                    xpadg[_PADG + sft:_PADG + sft + mg, :], k1_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                tap += 1
        sk1 = s1_ref[:].astype(jnp.float32).reshape(C2)
        v1 = acc1.astype(jnp.float32) * sk1[None, :]
        v1 = v1.reshape(tb, HGP * WGP, C2) * s1a[:, None, None] \
            + bias1[None, None, :]
        v1 = v1 * okg
        if stop == 7:
            return _dbg_out(out_ref, tb, HG, WG, v1)
        yg1 = _gn_leaky(
            v1, gm2_ref[:],
            g1s_ref[:].astype(jnp.float32).reshape(1, 1, C2),
            g1b_ref[:].astype(jnp.float32).reshape(1, 1, C2),
            gn_cnt2, valid=okg,
        )
        q2, s2a = _rowquant(yg1, tb)
        y1q[:_PADG, :] = jnp.zeros((_PADG, C2), jnp.int8)
        y1q[_PADG:_PADG + mg, :] = q2.reshape(mg, C2)
        y1q[_PADG + mg:, :] = jnp.zeros((_PADG, C2), jnp.int8)
        if stop == 8:
            return _dbg_out(out_ref, tb, HG, WG, q2)

        # ---- Conv_2 (3x3 pad1 on the 55x29 valid grid, maskless) ----
        bias2 = b2_ref[0].astype(jnp.float32)
        acc2 = jnp.zeros((mg, C3), jnp.int32)
        tap = 0
        for a in range(3):
            for c in range(3):
                sft = (a - 1) * WGP + (c - 1)
                acc2 = acc2 + jax.lax.dot_general(
                    y1q[_PADG + sft:_PADG + sft + mg, :], k2_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                tap += 1
        sk2 = s2_ref[:].astype(jnp.float32).reshape(C3)
        v2 = acc2.astype(jnp.float32) * sk2[None, :]
        v2 = v2.reshape(tb, HGP * WGP, C3) * s2a[:, None, None] \
            + bias2[None, None, :]
        v2 = v2 * okg
        yg2 = _gn_leaky(
            v2, gm3_ref[:],
            g2s_ref[:].astype(jnp.float32).reshape(1, 1, C3),
            g2b_ref[:].astype(jnp.float32).reshape(1, 1, C3),
            gn_cnt3, valid=okg,
        )
        y2q[:_PADG, :] = jnp.zeros((_PADG, C3), jnp.float32)
        y2q[_PADG:_PADG + mg, :] = yg2.reshape(mg, C3)
        y2q[_PADG + mg:, :] = jnp.zeros((_PADG, C3), jnp.float32)
        if stop == 9:
            return _dbg_out(out_ref, tb, HG, WG, yg2)

        # ---- Conv_3 (2x2 pad1, f32, maskless) + ReLU [+ expm1] ----
        bias3 = b3_ref[:].astype(jnp.float32)  # [1, 8]
        acc3 = jnp.zeros((mg, 8), jnp.float32)
        tap = 0
        for a in range(2):
            for c in range(2):
                sft = (a - 1) * WGP + (c - 1)
                acc3 = acc3 + jax.lax.dot_general(
                    y2q[_PADG + sft:_PADG + sft + mg, :], k3_ref[tap],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                tap += 1
        v3 = jnp.maximum(acc3 + bias3, 0.0)[:, :1]  # ReLU; real cout 0
        if apply_expm1:
            v3 = jnp.expm1(v3)
        out_ref[:] = v3.reshape(tb, HGP, WGP)[:, 1:1 + HG, 1:1 + WG]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("apply_expm1", "block_rows", "interpret", "debug_stop_stage"),
)
def fused_decode(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    conv0_kernel: jnp.ndarray, conv0_bias: jnp.ndarray,
    gn0_scale: jnp.ndarray, gn0_bias: jnp.ndarray,
    conv1_kernel: jnp.ndarray, conv1_bias: jnp.ndarray,
    gn1_scale: jnp.ndarray, gn1_bias: jnp.ndarray,
    conv2_kernel: jnp.ndarray, conv2_bias: jnp.ndarray,
    gn2_scale: jnp.ndarray, gn2_bias: jnp.ndarray,
    conv3_kernel: jnp.ndarray, conv3_bias: jnp.ndarray,
    apply_expm1: bool = False,
    block_rows: int = 8,
    interpret: bool | None = None,
    debug_stop_stage: int | None = None,
) -> jnp.ndarray:
    """Run the fused decode. ``x``: [B, 92160] Dense_1 output (pre-LN).

    Returns [B, 56, 30] f32 — ``relu(conv3(...))`` (log-space pixel
    intensities), or photon counts if ``apply_expm1``.
    """
    if interpret is None:
        interpret = not _is_tpu()
    b = x.shape[0]
    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)

    kq0, sk0 = _quant_phases(conv0_kernel)  # [25, 512, 256], [4, 256]
    kq1, sk1 = _quant_cout(conv1_kernel)  # [4, 4, 256, 128]
    kq1 = kq1.reshape(16, C1, C2)
    kq2, sk2 = _quant_cout(conv2_kernel)  # [3, 3, 128, 64]
    kq2 = kq2.reshape(9, C2, C3)
    k3 = jnp.zeros((4, C3, 8), jnp.float32)
    k3 = k3.at[:, :, 0].set(conv3_kernel.astype(jnp.float32).reshape(4, C3))
    b3 = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(
        conv3_bias.astype(jnp.float32).reshape(())
    )

    m0 = tb * H0P * W0P
    mg = tb * HGP * WGP
    const = lambda *dims: pl.BlockSpec(dims, lambda i: (0,) * len(dims),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_fused_kernel(tb, apply_expm1, debug_stop_stage),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, H0 * W0, C0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(1, H0 * W0, C0), const(1, H0 * W0, C0),
            const(25, C0, C1), const(4, C1), const(1, C1),
            const(1, C1), const(1, C1),
            const(16, C1, C2), const(1, C2), const(1, C2),
            const(1, C2), const(1, C2),
            const(9, C2, C3), const(1, C3), const(1, C3),
            const(1, C3), const(1, C3),
            const(4, C3, 8), const(1, 8),
            const(C1, 32), const(C2, 32), const(C3, 32),
        ],
        out_specs=pl.BlockSpec(
            (tb, HG, WG), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, HG, WG), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m0 + 2 * _PAD0, C0), jnp.int8),  # xpad0
            pltpu.VMEM((mg + 2 * _PADG, C1), jnp.int8),  # xpadg (resized)
            pltpu.VMEM((mg + 2 * _PADG, C2), jnp.int8),  # y1q
            pltpu.VMEM((mg + 2 * _PADG, C3), jnp.float32),  # y2q
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(
        x.reshape(b, H0 * W0, C0),
        ln_scale.reshape(1, H0 * W0, C0), ln_bias.reshape(1, H0 * W0, C0),
        kq0, sk0, conv0_bias.reshape(1, C1),
        gn0_scale.reshape(1, C1), gn0_bias.reshape(1, C1),
        kq1, sk1.reshape(1, C2), conv1_bias.reshape(1, C2),
        gn1_scale.reshape(1, C2), gn1_bias.reshape(1, C2),
        kq2, sk2.reshape(1, C3), conv2_bias.reshape(1, C3),
        gn2_scale.reshape(1, C3), gn2_bias.reshape(1, C3),
        k3, b3,
        _gmat(C1, 32), _gmat(C2, 32), _gmat(C3, 32),
    )
    return out


def _make_front_kernel(tb: int):
    def kernel(
        x_ref, lns_ref, lnb_ref,
        k0_ref, s0_ref, b0_ref, g0s_ref, g0b_ref,
        gm1_ref,
        q_ref, s_ref,
        xpad0,
    ):
        xr, s1a, _ = _front_stages(
            tb, None, x_ref, lns_ref, lnb_ref,
            k0_ref, s0_ref, b0_ref, g0s_ref, g0b_ref, gm1_ref, xpad0,
        )
        q_ref[:] = xr
        s_ref[:] = s1a.reshape(tb, 1, 1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_rows", "interpret")
)
def fused_decode_front(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    conv0_kernel: jnp.ndarray, conv0_bias: jnp.ndarray,
    gn0_scale: jnp.ndarray, gn0_bias: jnp.ndarray,
    block_rows: int = 8,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The FRONT HALF of the fused decode as one Pallas kernel: LayerNorm
    -> LeakyReLU -> int8 quant -> Conv_0 parity phases -> GroupNorm_0 ->
    LeakyReLU -> per-sample int8 quant -> interleave -> nearest resize to
    56x30, all VMEM-resident.

    Split rationale (chip-measured, experiments/fused_bisect4_r3.py): the
    front compiles in ~46 s, while adding the conv1..conv3 tail SIGKILLs
    the Mosaic compile helper (the 16+9+4 maskless tap slices on the
    59x33-padded grid are sublane-misaligned int8 slices, each of which
    expands into relayout code; conv1 alone pushes the compile to 303 s).
    The back half is exactly what XLA already runs well: one plain 4x4
    int8 conv on the materialized resize (35.6% int8-MXU utilization,
    resize_conv4_int8_naive) — so the split hands XLA the int8 resized
    grid its best-measured conv wants, and replaces the two stages the
    profiler blamed for VPU/layout overhead (MLP LayerNorm, conv0+gn0
    epilogues) with one custom call.

    ``x``: [B, 92160] Dense_1 output (pre-LN). Returns ``(q, s)``: the
    int8 resized grid [B, 56, 30, 256] and its per-sample dequant scale
    [B] (finer than the XLA path's per-tensor scale).
    """
    if interpret is None:
        interpret = not _is_tpu()
    b = x.shape[0]
    tb = block_rows
    while b % tb:
        tb //= 2
    tb = max(tb, 1)

    kq0, sk0 = _quant_phases(conv0_kernel)  # [25, 512, 256], [4, 256]
    m0 = tb * H0P * W0P
    const = lambda *dims: pl.BlockSpec(dims, lambda i: (0,) * len(dims),  # noqa: E731
                                       memory_space=pltpu.VMEM)
    q, s = pl.pallas_call(
        _make_front_kernel(tb),
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((tb, H0 * W0, C0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(1, H0 * W0, C0), const(1, H0 * W0, C0),
            const(25, C0, C1), const(4, C1), const(1, C1),
            const(1, C1), const(1, C1),
            const(C1, 32),
        ],
        out_specs=(
            pl.BlockSpec((tb, HG, WG, C1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # rank-3 (b,1,1): the TPU lowering requires the block's last
            # two dims divisible by (8,128) OR equal to the array's — a
            # (tb,1) block fails at tb<8, (tb,1,1) passes at any tb.
            pl.BlockSpec((tb, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, HG, WG, C1), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m0 + 2 * _PAD0, C0), jnp.int8),  # xpad0
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(
        x.reshape(b, H0 * W0, C0),
        ln_scale.reshape(1, H0 * W0, C0), ln_bias.reshape(1, H0 * W0, C0),
        kq0, sk0, conv0_bias.reshape(1, C1),
        gn0_scale.reshape(1, C1), gn0_bias.reshape(1, C1),
        _gmat(C1, 32),
    )
    return q, s.reshape(b)


def fused_decode_front_from_params(
    params, x: jnp.ndarray, **kw
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Front-kernel convenience wrapper over a ``proton.Generator``
    parameter tree (see :func:`fused_decode_from_params`)."""
    p = params
    ln = p["MLPBlock_1"]["LayerNorm_0"]
    return fused_decode_front(
        x,
        ln["scale"], ln["bias"],
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
        p["GroupNorm2d_0"]["GroupNorm_0"]["scale"],
        p["GroupNorm2d_0"]["GroupNorm_0"]["bias"],
        **kw,
    )


def fused_decode_from_params(
    params, x: jnp.ndarray, apply_expm1: bool = False, **kw
) -> jnp.ndarray:
    """Convenience wrapper: pull the LN/conv/GN parameter leaves out of a
    ``zdcsim.models.proton.Generator`` parameter tree (the exact tree
    ``fast_generator_apply`` consumes) and run :func:`fused_decode`.
    ``x`` is the Dense_1 output (pre-LayerNorm), shape [B, 92160]."""
    p = params
    ln = p["MLPBlock_1"]["LayerNorm_0"]
    return fused_decode(
        x,
        ln["scale"], ln["bias"],
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
        p["GroupNorm2d_0"]["GroupNorm_0"]["scale"],
        p["GroupNorm2d_0"]["GroupNorm_0"]["bias"],
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
        p["GroupNorm2d_1"]["GroupNorm_0"]["scale"],
        p["GroupNorm2d_1"]["GroupNorm_0"]["bias"],
        p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
        p["GroupNorm2d_2"]["GroupNorm_0"]["scale"],
        p["GroupNorm2d_2"]["GroupNorm_0"]["bias"],
        p["Conv_3"]["kernel"], p["Conv_3"]["bias"],
        apply_expm1=apply_expm1, **kw,
    )
