"""Tests for the neutron fast serving path (zdcsim/models/neutron_fast.py):
BatchNorm folding exactness, int8 variant sanity, engine wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models.neutron import GeneratorNeutron
from zdcsim.models.neutron_fast import (
    fast_neutron_apply,
    fold_neutron_params,
    is_foldable,
)

B = 4


def _gen_with_stats():
    """Init a neutron generator and give it NON-TRIVIAL running statistics
    (a fresh init has mean=0/var=1, which would hide sign/affine bugs)."""
    gen = GeneratorNeutron(norm="batch")
    key = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9))
    variables = gen.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        noise, cond, False,
    )
    params, stats = variables["params"], variables["batch_stats"]
    rngs = iter(jax.random.split(jax.random.PRNGKey(9), 32))
    stats = jax.tree_util.tree_map_with_path(
        lambda path, x: (
            0.3 * jax.random.normal(next(rngs), x.shape)
            if path[-1].key == "mean"
            else 0.5 + jax.random.uniform(next(rngs), x.shape)
        ),
        stats,
    )
    return gen, params, stats, noise, cond


def test_fold_matches_module_eval():
    gen, params, stats, noise, cond = _gen_with_stats()
    ref = gen.apply(
        {"params": params, "batch_stats": stats}, noise, cond, False
    )
    assert is_foldable(params)
    folded = fold_neutron_params(params, stats)
    out = fast_neutron_apply(folded, noise, cond)
    assert out.shape == (B, 44, 44, 1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_int8_variant_statistically_close():
    gen, params, stats, noise, cond = _gen_with_stats()
    folded = fold_neutron_params(params, stats)
    a = np.asarray(fast_neutron_apply(folded, noise, cond))
    b = np.asarray(fast_neutron_apply(folded, noise, cond, int8=True))
    assert b.shape == a.shape
    assert np.isfinite(b).all() and b.min() >= 0.0
    np.testing.assert_allclose(
        np.log1p(a.sum((1, 2, 3))), np.log1p(b.sum((1, 2, 3))), rtol=0.1
    )


def _neutron_cfg(norm: str):
    from zdcsim.config import load_config

    return load_config(overrides=[
        "model.architecture=neutron", "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44, 44]", "model.n_experts=2",
        f"model.norm={norm}",
    ])


def test_engine_uses_neutron_fold():
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = _neutron_cfg("batch")
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    eng_fast = FastSim.from_state(modules, state, batch_size=B, precision="f32")
    eng_ref = FastSim.from_state(
        modules, state, batch_size=B, precision="f32", fast=False
    )
    assert eng_fast._fast_neutron and not eng_ref._fast_neutron
    cond = np.random.default_rng(0).normal(size=(B, 9)).astype(np.float32)
    key = jax.random.PRNGKey(1)
    out_fast = np.asarray(eng_fast.simulate(cond, key))
    out_ref = np.asarray(eng_ref.simulate(cond, key))
    assert out_fast.shape == (B, 44, 44)
    np.testing.assert_allclose(out_fast, out_ref, rtol=2e-3, atol=2e-3)


def test_engine_neutron_group_norm_falls_back():
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = _neutron_cfg("group")
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    eng = FastSim.from_state(modules, state, batch_size=B, precision="int8")
    assert not eng._fast_neutron and not eng._int8  # module path, bf16
    cond = np.random.default_rng(0).normal(size=(B, 9)).astype(np.float32)
    out = np.asarray(eng.simulate(cond, jax.random.PRNGKey(1)))
    assert out.shape == (B, 44, 44) and np.isfinite(out).all()


def test_norm_none_student_is_prefolded_and_exact():
    """A norm="none" width-scaled student's parameter tree IS the folded
    serving layout: fast_neutron_apply must consume it directly and match
    the module eval forward bit-for-bit semantics (f32)."""
    from zdcsim.models.neutron_fast import is_prefolded

    gen = GeneratorNeutron(norm="none", width=0.5)
    key = jax.random.PRNGKey(5)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9))
    variables = gen.init({"params": jax.random.PRNGKey(11)}, noise, cond, False)
    params = variables["params"]
    assert set(variables) == {"params"}  # no batch_stats for norm="none"
    assert is_prefolded(params) and not is_foldable(params)
    # width=0.5 scales the channel dims (128->64, 256->128, 64->32)
    assert params["Dense_1"]["kernel"].shape[-1] == 64 * 13 * 13
    assert params["Conv_0"]["kernel"].shape[-1] == 128

    ref = gen.apply(variables, noise, cond, False)
    out = fast_neutron_apply(params, noise, cond)
    assert out.shape == (B, 44, 44, 1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_engine_serves_norm_none_student():
    """FastSim must route a norm="none" neutron student through the fast
    path (int8 enabled) with no fold step."""
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe

    cfg = _neutron_cfg("none")
    cfg.model.generator.width = 0.5
    modules = build_moe(cfg)
    z0 = jnp.zeros((2, modules.noise_dim))
    c0 = jnp.zeros((2, modules.cond_dim))
    gen_params = modules.generator.init(
        {"params": jax.random.PRNGKey(13)}, z0, c0, False
    )["params"]
    router_params = modules.router.init({"params": jax.random.PRNGKey(14)}, c0)[
        "params"
    ]
    eng = FastSim(modules, gen_params, {}, router_params,
                  batch_size=B, precision="int8")
    assert eng._fast_neutron and eng._int8
    cond = np.random.default_rng(2).normal(size=(B, 9)).astype(np.float32)
    out = np.asarray(eng.simulate(cond, jax.random.PRNGKey(3)))
    assert out.shape == (B, 44, 44)
    assert np.isfinite(out).all() and out.min() >= 0.0


def test_engine_neutron_ema_int8_smoke():
    """EMA serving weights + int8 through the neutron fold: the EMA tree
    shadows the BN scale/bias params while batch_stats stay live — the
    fold must consume both without structure errors."""
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = _neutron_cfg("batch")
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    eng = FastSim.from_state(
        modules, state, batch_size=B, precision="int8", use_ema=True
    )
    assert eng._fast_neutron and eng._int8
    cond = np.random.default_rng(1).normal(size=(B, 9)).astype(np.float32)
    out = np.asarray(eng.simulate(cond, jax.random.PRNGKey(2)))
    assert out.shape == (B, 44, 44)
    assert np.isfinite(out).all() and out.min() >= 0.0
