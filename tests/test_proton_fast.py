"""Equivalence tests for the fused (FLOP-reduced) proton generator forward."""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models.layers import upsample_nearest
from zdcsim.models.proton import Generator
from zdcsim.models.proton_fast import fast_generator_apply, fused_upsample2_conv4


def test_fused_upsample_conv_equivalence(rng):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 18, 10, 16))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 16, 8))
    b = jax.random.normal(jax.random.fold_in(key, 2), (8,))
    naive = jax.lax.conv_general_dilated(
        jnp.pad(upsample_nearest(x), ((0, 0), (1, 1), (1, 1), (0, 0))),
        k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    fused = fused_upsample2_conv4(x, k, b)
    np.testing.assert_allclose(np.asarray(naive), np.asarray(fused), rtol=1e-4, atol=1e-4)


def test_fast_generator_matches_module():
    key = jax.random.PRNGKey(3)
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (4, 9))
    variables = gen.init({"params": jax.random.PRNGKey(7)}, noise, cond, False)
    ref = gen.apply(variables, noise, cond, False)
    fast = fast_generator_apply(variables["params"], noise, cond)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fast), rtol=2e-3, atol=2e-3)


def test_fastsim_uses_fast_path_for_proton():
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = load_config(overrides=["model.n_experts=2"])
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    engine_fast = FastSim.from_state(modules, state, batch_size=4, fast=True)
    engine_ref = FastSim.from_state(modules, state, batch_size=4, fast=False)
    assert engine_fast.uses_fast_path and not engine_ref.uses_fast_path
    cond = np.zeros((4, 9), np.float32)
    a = engine_fast.simulate(cond, jax.random.PRNGKey(1))
    b = engine_ref.simulate(cond, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_fused_row_resize_conv_equivalence():
    from zdcsim.models.layers import resize_nearest
    from zdcsim.models.proton_fast import fused_row_resize_conv4

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 35, 19, 8))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 8, 5))
    b = jax.random.normal(jax.random.fold_in(key, 2), (5,))
    naive = jax.lax.conv_general_dilated(
        resize_nearest(x, (56, 30)), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    fused = fused_row_resize_conv4(x, k, b, 56, 30)
    np.testing.assert_allclose(np.asarray(naive), np.asarray(fused), rtol=1e-4, atol=1e-4)


def test_fused_conv_gradients_match_naive():
    """The custom VJPs (backward through the naive form) must produce the
    same gradients autodiff of the naive formulation gives — this is what
    makes train.fast_generator=true trainable without the phase-transpose
    temp blowup."""
    from zdcsim.models.layers import resize_nearest
    from zdcsim.models.proton_fast import fused_row_resize_conv4

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 18, 10, 6))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 6, 3))
    b = jax.random.normal(jax.random.fold_in(key, 2), (3,))
    g_fast = jax.grad(lambda x, k, b: jnp.sum(fused_upsample2_conv4(x, k, b) ** 2),
                      argnums=(0, 1, 2))(x, k, b)

    def naive_up(x, k, b):
        y = jax.lax.conv_general_dilated(
            jnp.pad(upsample_nearest(x), ((0, 0), (1, 1), (1, 1), (0, 0))),
            k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return jnp.sum(y ** 2)

    g_naive = jax.grad(naive_up, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(g_fast, g_naive):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)

    x2 = jax.random.normal(key, (2, 35, 19, 6))
    k2 = jax.random.normal(jax.random.fold_in(key, 3), (4, 4, 6, 3))
    b2 = jax.random.normal(jax.random.fold_in(key, 4), (3,))
    g_fast2 = jax.grad(
        lambda x, k, b: jnp.sum(fused_row_resize_conv4(x, k, b, 56, 30) ** 2),
        argnums=(0, 1, 2))(x2, k2, b2)

    def naive_rr(x, k, b):
        y = jax.lax.conv_general_dilated(
            resize_nearest(x, (56, 30)), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return jnp.sum(y ** 2)

    g_naive2 = jax.grad(naive_rr, argnums=(0, 1, 2))(x2, k2, b2)
    for a, bb in zip(g_fast2, g_naive2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)


def test_int8_quant_helpers():
    from zdcsim.models.proton_fast import _quant_act, _quant_per_cout

    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (4, 4, 8, 6))
    q, s = _quant_per_cout(k)
    assert q.dtype == jnp.int8 and s.shape == (6,)
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), np.asarray(k), atol=float(s.max())
    )
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, 5, 5, 8)) * 4.0
    xq, sx = _quant_act(x)
    np.testing.assert_allclose(
        np.asarray(xq, np.float32) * float(sx), np.asarray(x), atol=float(sx)
    )


def test_int8_fused_convs_approximate_f32():
    """int8 fused convs must track the exact path within quantization error
    (per-channel weights + per-tensor activations: ~1% relative)."""
    from zdcsim.models.proton_fast import (
        fused_row_resize_conv4, fused_row_resize_conv4_int8,
        fused_upsample2_conv4_int8,
    )

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 18, 10, 16))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 16, 8))
    b = jax.random.normal(jax.random.fold_in(key, 2), (8,))
    exact = fused_upsample2_conv4(x, k, b)
    q8 = fused_upsample2_conv4_int8(x, k, b)
    scale = float(jnp.std(exact))
    np.testing.assert_allclose(np.asarray(q8), np.asarray(exact), atol=0.1 * scale)

    x2 = jax.random.normal(key, (2, 35, 19, 16))
    exact2 = fused_row_resize_conv4(x2, k, b, 56, 30)
    q82 = fused_row_resize_conv4_int8(x2, k, b, 56, 30)
    scale2 = float(jnp.std(exact2))
    np.testing.assert_allclose(np.asarray(q82), np.asarray(exact2), atol=0.1 * scale2)


def test_fast_generator_int8_mode():
    """precision='int8' end-to-end: runs, outputs finite/non-negative, and
    statistically close to the f32 engine (GN renormalizes conv scale)."""
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = load_config(overrides=["model.n_experts=2"])
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    engine_q = FastSim.from_state(modules, state, batch_size=4, precision="int8")
    engine_f = FastSim.from_state(modules, state, batch_size=4, precision="f32")
    assert engine_q._int8 and not engine_f._int8
    cond = np.random.default_rng(0).normal(size=(4, 9)).astype(np.float32)
    a = np.asarray(engine_q.simulate(cond, jax.random.PRNGKey(1)))
    b = np.asarray(engine_f.simulate(cond, jax.random.PRNGKey(1)))
    assert np.isfinite(a).all() and a.min() >= 0.0
    # same noise, same weights: per-shower photon sums track (loose bound —
    # untrained random weights amplify quantization noise through expm1;
    # the physics-grade gate is the trained-checkpoint WS delta measured on
    # chip, BENCH_LOG.md)
    sa, sb = a.sum(axis=(1, 2)), b.sum(axis=(1, 2))
    np.testing.assert_allclose(np.log1p(sa), np.log1p(sb), rtol=0.1)


def test_fast_generator_trains(rng):
    """train.fast_generator=true runs a full train step (fwd+bwd) and matches
    the module-path step's losses (same params, same keys)."""
    from zdcsim.config import load_config
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state
    from zdcsim.train.step import build_train_step

    base = ["model.n_experts=2", "train.batch_size=4"]
    cfg_fast = load_config(overrides=base + ["train.fast_generator=true"])
    cfg_ref = load_config(overrides=base)
    modules = build_moe(cfg_fast)
    state_f = init_state(modules, cfg_fast, jax.random.PRNGKey(0))
    state_r = init_state(modules, cfg_ref, jax.random.PRNGKey(0))
    B = 4
    batch = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, 56, 30, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (B, 9)),
        "std": jnp.ones((B, 1)) * 0.5,
        "intensity": jnp.ones((B, 1)) * 10.0,
        "positions": jnp.ones((B, 2)),
    }
    step_f = build_train_step(modules, cfg_fast)
    step_r = build_train_step(modules, cfg_ref)
    _, m_f = step_f(state_f, dict(batch), jax.random.PRNGKey(3), jnp.asarray(0))
    _, m_r = step_r(state_r, dict(batch), jax.random.PRNGKey(3), jnp.asarray(0))
    np.testing.assert_allclose(
        float(m_f["gen_loss"]), float(m_r["gen_loss"]), rtol=5e-3
    )
    np.testing.assert_allclose(
        float(m_f["disc_loss"]), float(m_r["disc_loss"]), rtol=5e-3
    )


def test_fast_generator_int8_pallas_ab_engine():
    """precision='int8_pallas_ab' (mixed Pallas LN-quant+Conv_0, XLA int8
    rest) runs end-to-end through the engine (interpret-mode kernels on CPU)
    and tracks the plain int8 engine closely (same weights/noise; the two
    differ only in activation-scale granularity)."""
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = load_config(overrides=["model.n_experts=2"])
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    eng_p = FastSim.from_state(modules, state, batch_size=4, precision="int8_pallas_ab")
    eng_q = FastSim.from_state(modules, state, batch_size=4, precision="int8")
    assert eng_p._int8 and eng_p._int8_backend == "pallas_ab"
    cond = np.random.default_rng(0).normal(size=(4, 9)).astype(np.float32)
    a = np.asarray(eng_p.simulate(cond, jax.random.PRNGKey(1)))
    b = np.asarray(eng_q.simulate(cond, jax.random.PRNGKey(1)))
    assert np.isfinite(a).all() and a.min() >= 0.0
    np.testing.assert_allclose(
        np.log1p(a.sum(axis=(1, 2))), np.log1p(b.sum(axis=(1, 2))), rtol=0.15
    )


def test_int8_naive_convs_approximate_f32():
    """Naive int8 conv forms (one plain conv on the materialized int8
    upsample/resize — the round-3 measured-fastest Conv_1 formulation) must
    track the exact f32 path within quantization error, like the phase
    forms they replace."""
    from zdcsim.models.proton_fast import (
        fused_row_resize_conv4, fused_upsample2_conv4,
        resize_conv4_int8_naive, upsample2_conv4_int8_naive,
    )

    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 18, 10, 16))
    k = jax.random.normal(jax.random.fold_in(key, 1), (4, 4, 16, 8))
    b = jax.random.normal(jax.random.fold_in(key, 2), (8,))
    exact = fused_upsample2_conv4(x, k, b)
    q8 = upsample2_conv4_int8_naive(x, k, b)
    assert q8.shape == exact.shape
    scale = float(jnp.std(exact))
    np.testing.assert_allclose(np.asarray(q8), np.asarray(exact), atol=0.1 * scale)

    x2 = jax.random.normal(key, (2, 35, 19, 16))
    exact2 = fused_row_resize_conv4(x2, k, b, 56, 30)
    q82 = resize_conv4_int8_naive(x2, k, b, 56, 30)
    assert q82.shape == exact2.shape
    scale2 = float(jnp.std(exact2))
    np.testing.assert_allclose(np.asarray(q82), np.asarray(exact2), atol=0.1 * scale2)


def test_int8_conv_impl_selectors():
    """INT8_CONV0_IMPL/INT8_CONV1_IMPL swap formulations inside
    fast_generator_apply without changing results beyond quantization
    rounding (different-but-valid weight roundings)."""
    from zdcsim.models import proton_fast as pf

    key = jax.random.PRNGKey(5)
    gen = Generator()
    noise = jax.random.normal(jax.random.fold_in(key, 1), (4, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (4, 9))
    variables = gen.init({"params": jax.random.PRNGKey(8)}, noise, cond, False)
    params = variables["params"]
    saved = pf.INT8_CONV0_IMPL, pf.INT8_CONV1_IMPL
    try:
        pf.INT8_CONV0_IMPL, pf.INT8_CONV1_IMPL = "phase", "folded"
        a = np.asarray(pf.fast_generator_apply(params, noise, cond, int8=True))
        pf.INT8_CONV0_IMPL, pf.INT8_CONV1_IMPL = "naive", "naive"
        b = np.asarray(pf.fast_generator_apply(params, noise, cond, int8=True))
    finally:
        pf.INT8_CONV0_IMPL, pf.INT8_CONV1_IMPL = saved
    assert a.shape == b.shape
    assert np.isfinite(b).all() and b.min() >= 0.0
    np.testing.assert_allclose(np.log1p(a.sum((1, 2))), np.log1p(b.sum((1, 2))), rtol=0.1)
