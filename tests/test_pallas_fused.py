"""Tests for the single fused Pallas decode kernel
(zdcsim/ops/pallas_decode_fused.py) — interpreter mode on CPU; the same
code compiles on TPU (perf + fidelity measured in BENCH_LOG.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models.proton import Generator
from zdcsim.models.proton_fast import fast_generator_apply
from zdcsim.ops.pallas_decode_fused import (
    fused_decode_from_params,
    fused_decode_front_from_params,
)

B = 8


def _gen_params():
    gen = Generator()
    key = jax.random.PRNGKey(11)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9))
    variables = gen.init({"params": jax.random.PRNGKey(5)}, noise, cond, False)
    return variables["params"], noise, cond


def _dense1_out(params, noise, cond):
    x = jnp.concatenate([noise, cond], axis=1)
    bp0 = params["MLPBlock_0"]
    x = x @ bp0["Dense_0"]["kernel"] + bp0["Dense_0"]["bias"]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-6) * bp0["LayerNorm_0"]["scale"] + \
        bp0["LayerNorm_0"]["bias"]
    x = jax.nn.leaky_relu(x, negative_slope=0.1)
    bp1 = params["MLPBlock_1"]
    return x @ bp1["Dense_0"]["kernel"] + bp1["Dense_0"]["bias"]


def test_fused_decode_close_to_float_path():
    """The whole-decode kernel must track the exact f32 forward within
    CASCADED int8 quantization error — measured against the production
    XLA int8 path's own error (same three int8 convs; the kernel's
    per-sample activation scales are finer than XLA's per-tensor ones,
    so its error must not exceed the XLA path's by more than a margin)."""
    params, noise, cond = _gen_params()
    exact = np.asarray(fast_generator_apply(params, noise, cond))[..., 0]
    xla8 = np.asarray(fast_generator_apply(params, noise, cond, int8=True))[..., 0]
    x = _dense1_out(params, noise, cond)
    fused = np.asarray(fused_decode_from_params(params, x, interpret=True))
    assert fused.shape == (B, 56, 30)
    err_fused = np.abs(fused - exact)
    err_xla8 = np.abs(xla8 - exact)
    assert err_fused.mean() <= err_xla8.mean() * 1.25
    assert err_fused.max() <= max(err_xla8.max() * 1.5, 0.05 * exact.std())


def test_fused_decode_expm1_flag():
    params, noise, cond = _gen_params()
    x = _dense1_out(params, noise, cond)
    base = fused_decode_from_params(params, x, interpret=True)
    counts = fused_decode_from_params(params, x, apply_expm1=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.expm1(base)), np.asarray(counts), rtol=1e-5, atol=1e-5
    )


def test_fast_generator_backend_fused():
    """int8_backend='fused' through fast_generator_apply matches the XLA
    int8 path statistically (different-but-valid quantization roundings)."""
    params, noise, cond = _gen_params()
    a = np.asarray(fast_generator_apply(params, noise, cond, int8=True))
    b = np.asarray(
        fast_generator_apply(params, noise, cond, int8=True, int8_backend="fused")
    )
    assert b.shape == a.shape
    assert np.isfinite(b).all() and b.min() >= 0.0
    np.testing.assert_allclose(
        np.log1p(a.sum((1, 2, 3))), np.log1p(b.sum((1, 2, 3))), rtol=0.1
    )


def test_fused_front_matches_xla_int8_resize():
    """The front kernel's (int8 grid, scale) must dequantize to the same
    GN0+leaky+resize activations the XLA int8 path computes, within the
    two paths' quantization granularity (per-sample vs per-tensor)."""
    from zdcsim.models.proton_fast import (
        _group_norm, _layer_norm, _leaky, fused_upsample2_conv4,
    )

    params, noise, cond = _gen_params()
    x = _dense1_out(params, noise, cond)
    q, s = fused_decode_front_from_params(params, x, interpret=True)
    assert q.shape == (B, 56, 30, 256) and s.shape == (B,)
    deq = np.asarray(q.astype(jnp.float32) * s[:, None, None, None])

    # exact f32 reference of the same stages
    h = _leaky(_layer_norm(x, params["MLPBlock_1"]["LayerNorm_0"]))
    h = h.reshape(B, 18, 10, 512)
    h = fused_upsample2_conv4(h, params["Conv_0"]["kernel"], params["Conv_0"]["bias"])
    h = _leaky(_group_norm(h, params["GroupNorm2d_0"]["GroupNorm_0"], 256))
    row_map = np.floor((np.arange(56) + 0.5) * 35 / 56).astype(int)
    col_map = np.floor((np.arange(30) + 0.5) * 19 / 30).astype(int)
    ref = np.asarray(h)[:, row_map][:, :, col_map]

    # The front has TWO cascaded int8 quants (pre-Conv_0 and post-GN0):
    # the final quant bounds each value at ~s/2, but the first quant's
    # error propagates through conv+GN, so a small fraction of values
    # legitimately exceeds the last-stage step.
    err = np.abs(deq - ref)
    tol = np.asarray(s)[:, None, None, None] * 1.5 + 1e-4
    assert (err <= tol).mean() > 0.99
    assert err.mean() <= ref.std() * 0.02


def test_fast_generator_backend_fused_front():
    params, noise, cond = _gen_params()
    a = np.asarray(fast_generator_apply(params, noise, cond, int8=True))
    b = np.asarray(
        fast_generator_apply(
            params, noise, cond, int8=True, int8_backend="fused_front"
        )
    )
    assert b.shape == a.shape
    assert np.isfinite(b).all() and b.min() >= 0.0
    np.testing.assert_allclose(
        np.log1p(a.sum((1, 2, 3))), np.log1p(b.sum((1, 2, 3))), rtol=0.1
    )


def test_engine_precision_int8_fused():
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = load_config(overrides=["model.n_experts=2"])
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    eng = FastSim.from_state(modules, state, batch_size=4, precision="int8_fused")
    assert eng._int8 and eng._int8_backend == "fused"
    cond = np.random.default_rng(0).normal(size=(4, 9)).astype(np.float32)
    out = np.asarray(eng.simulate(cond, jax.random.PRNGKey(1)))
    assert out.shape == (4, 56, 30)
    assert np.isfinite(out).all() and out.min() >= 0.0
