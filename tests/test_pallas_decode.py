"""Exactness tests for the int8 serving-decode Pallas kernels
(zdcsim/ops/pallas_decode.py) — interpreter mode on CPU; the same code
compiles on TPU (perf measured in BENCH_LOG.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models.proton_fast import _conv_i8, _interleave, fused_upsample2_conv4
from zdcsim.ops.pallas_decode import (
    _PHASES,
    _phase_kernels,
    _quant_phases,
    ln_leaky_rowquant,
    up2_conv4_int8,
)


def test_ln_leaky_rowquant_matches_reference():
    b, f = 16, 1024
    y = jax.random.normal(jax.random.PRNGKey(0), (b, f), jnp.float32) * 3.0
    scale = jax.random.normal(jax.random.PRNGKey(1), (f,)) * 0.5 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (f,)) * 0.2

    q, s = ln_leaky_rowquant(y, scale, bias, interpret=True)
    assert q.shape == (b, f) and q.dtype == jnp.int8
    assert s.shape == (b, 1)

    # reference: identical math in plain XLA
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=1, keepdims=True)
    z = (y - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
    z = jnp.where(z >= 0, z, 0.1 * z)
    s_ref = jnp.maximum(jnp.max(jnp.abs(z), axis=1, keepdims=True) / 127.0, 1e-12)
    q_ref = jnp.clip(jnp.round(z / s_ref), -127, 127).astype(jnp.int8)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    # identical ops -> at most round-boundary flips from fp association
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert (diff <= 1).all() and (diff != 0).mean() < 0.01
    # dequantized activations approximate the float path to quant precision
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s),
        np.asarray(z), atol=float(np.asarray(s).max()) * 0.51 + 1e-6,
    )


def _reference_phase_conv(xq, sx, kernel, bias):
    """int32-exact XLA reference of the fused phase conv on quantized data."""
    kq, sk = _quant_phases(kernel)
    shapes = {"ee": (3, 3), "eo": (3, 2), "oe": (2, 3), "oo": (2, 2)}
    pads = {
        "ee": ((1, 1), (1, 1)), "eo": ((1, 1), (0, 0)),
        "oe": ((0, 0), (1, 1)), "oo": ((0, 0), (0, 0)),
    }
    outs = {}
    tap = 0
    for p, name in enumerate(_PHASES):
        lr, lc = shapes[name]
        k_p = kq[tap:tap + lr * lc].reshape(lr, lc, kq.shape[1], kq.shape[2])
        tap += lr * lc
        y = _conv_i8(xq, k_p, pads[name]).astype(jnp.float32)
        outs[name] = y * sk[p][None, None, None, :] * sx.reshape(-1, 1, 1, 1)
    rows_even = _interleave(outs["ee"], outs["eo"], axis=2)
    rows_odd = _interleave(outs["oe"], outs["oo"], axis=2)
    return _interleave(rows_even, rows_odd, axis=1) + bias


def test_up2_conv4_int8_matches_int32_exact_reference():
    b, h, w, cin, cout = 4, 6, 4, 16, 8
    key = jax.random.PRNGKey(3)
    xq = jax.random.randint(key, (b, h, w, cin), -127, 128, jnp.int8)
    sx = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (b,))) * 0.01 + 1e-3
    kernel = jax.random.normal(jax.random.PRNGKey(5), (4, 4, cin, cout)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(6), (cout,)) * 0.5

    out = up2_conv4_int8(
        xq, sx, kernel, bias, out_dtype=jnp.float32, block_rows=2, interpret=True
    )
    ref = _reference_phase_conv(xq, sx, kernel, bias)
    assert out.shape == (b, 2 * h - 1, 2 * w - 1, cout) == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_up2_conv4_int8_close_to_float_path():
    """End int8 result stays within quantization distance of the exact float
    fused conv (same check the XLA int8 path passed before production use)."""
    b, h, w, cin, cout = 2, 6, 4, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(7), (b, h, w, cin))
    kernel = jax.random.normal(jax.random.PRNGKey(8), (4, 4, cin, cout)) * 0.1
    bias = jnp.zeros((cout,))
    # per-sample quant of the activations
    s = jnp.max(jnp.abs(x.reshape(b, -1)), axis=1) / 127.0
    xq = jnp.clip(jnp.round(x / s[:, None, None, None]), -127, 127).astype(jnp.int8)

    out = up2_conv4_int8(
        xq, s, kernel, bias, out_dtype=jnp.float32, block_rows=2, interpret=True
    )
    exact = fused_upsample2_conv4(x, kernel, bias)
    denom = float(jnp.max(jnp.abs(exact)))
    rel = float(jnp.max(jnp.abs(out - exact))) / denom
    assert rel < 0.05, f"int8 deviation {rel:.4f} too large"


def test_phase_kernel_algebra_matches_float_path():
    """The phase-merge used for quantization equals the float fused conv's."""
    h, w, cin, cout = 5, 4, 3, 2
    x = jax.random.normal(jax.random.PRNGKey(9), (1, h, w, cin))
    kernel = jax.random.normal(jax.random.PRNGKey(10), (4, 4, cin, cout))
    ks = _phase_kernels(kernel)
    assert ks["ee"].shape == (3, 3, cin, cout)
    assert ks["eo"].shape == (3, 2, cin, cout)
    assert ks["oe"].shape == (2, 3, cin, cout)
    assert ks["oo"].shape == (2, 2, cin, cout)
    # float phase conv path (proton_fast) is the ground truth of the algebra
    out = fused_upsample2_conv4(x, kernel, jnp.zeros((cout,)))
    assert out.shape == (1, 2 * h - 1, 2 * w - 1, cout)


def test_gn_leaky_rowquant_matches_reference():
    from zdcsim.models.proton_fast import _group_norm
    from zdcsim.ops.pallas_decode import gn_leaky_rowquant

    # c=64 -> group_norm_groups(64, 32) == 32: the reference and the kernel
    # agree on the group count without patching (production Conv_0/Conv_1
    # channels are 256/128 -> 32 groups too).
    b, h, w, c, groups = 4, 5, 3, 64, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)) * 2.0
    scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (c,))) + 0.5
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.3

    q, s = gn_leaky_rowquant(x, scale, bias, groups=groups, block_rows=2, interpret=True)
    # reference: flax-style GroupNorm (proton_fast._group_norm) + leaky + quant
    from zdcsim.models import proton_fast as pf

    z = pf._group_norm(x, {"scale": scale, "bias": bias}, c)
    z = jnp.where(z >= 0, z, 0.1 * z)
    s_ref = jnp.maximum(
        jnp.max(jnp.abs(z.reshape(b, -1)), axis=1, keepdims=True) / 127.0, 1e-12
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4)
    deq = np.asarray(q, np.float32).reshape(b, -1) * np.asarray(s)
    np.testing.assert_allclose(
        deq, np.asarray(z.reshape(b, -1)),
        atol=float(np.asarray(s).max()) * 0.75 + 1e-6,
    )


def test_row_resize_conv4_int8_matches_float_path():
    """Kernel D vs the exact float row-resize conv on dequantized data —
    error bounded by the int8 quantization budget. Uses the PRODUCTION
    35->56 stride-5 row-phase plan."""
    from zdcsim.models.proton_fast import fused_row_resize_conv4
    from zdcsim.ops.pallas_decode import row_resize_conv4_int8

    b, h_src, w, cin, cout = 2, 35, 6, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h_src, w, cin))
    kernel = jax.random.normal(jax.random.PRNGKey(4), (4, 4, cin, cout)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(5), (cout,)) * 0.1

    s = jnp.max(jnp.abs(x.reshape(b, -1)), axis=1) / 127.0
    xq = jnp.clip(jnp.round(x / s[:, None, None, None]), -127, 127).astype(jnp.int8)
    out = row_resize_conv4_int8(
        xq, s, kernel, bias, 56, out_dtype=jnp.float32, block_rows=2, interpret=True
    )[:, :, : w - 1]
    # identity col-resize (w_in == n_cols) -> reference handles rows only
    exact = fused_row_resize_conv4(x, kernel, bias, 56, w)
    assert out.shape == exact.shape == (b, 55, w - 1, cout)
    denom = float(jnp.max(jnp.abs(exact)))
    rel = float(jnp.max(jnp.abs(out - exact))) / denom
    assert rel < 0.05, f"int8 deviation {rel:.4f}"
    # correlation check: indexing errors destroy agreement even within 5%
    flat_a, flat_b = np.asarray(out).ravel(), np.asarray(exact).ravel()
    cc = np.corrcoef(flat_a, flat_b)[0, 1]
    assert cc > 0.999, f"corr {cc}"


def test_decode_backend_pallas_ab_close_to_xla_int8():
    """`int8_backend="pallas_ab"` (Pallas fused LN-quant + Conv_0, XLA int8
    for the rest — the measured production mix, experiments/perf_serve_r3.py)
    stays within quantization distance of the XLA int8 decode, and both stay
    within int8 distance of the float decode."""
    import jax
    import numpy as np

    from zdcsim.models.proton import Generator
    from zdcsim.models.proton_fast import fast_generator_apply

    key = jax.random.PRNGKey(11)
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (4, 9))
    variables = gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)
    p = variables["params"]

    ref = np.asarray(fast_generator_apply(p, noise, cond))
    scale = np.abs(ref).max()
    for backend in ("pallas_ab", "pallas"):
        out = np.asarray(
            fast_generator_apply(p, noise, cond, int8=True, int8_backend=backend)
        )
        assert out.shape == ref.shape
        err = np.abs(out - ref).max()
        assert err < 0.05 * scale + 0.05, (backend, err, scale)
