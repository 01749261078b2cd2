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
