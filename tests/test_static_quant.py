"""Static calibrated int8 activation scales (reduce-free quantize).

The dynamic per-tensor activation quantize (``proton_fast._quant_act``)
computes ``max(|x|)`` per call — a reduce that forces XLA to materialize,
reduce, and re-read the activation every tile. ``act_scales`` replaces it
with a calibrated constant so the quantize fuses into the producer's
epilogue. Exactness contract: with the scale set to the dynamic path's own
max-derived value, the static path is BIT-IDENTICAL to the dynamic path
(same rounding, same clip). Engine-level: ``FastSim(static_act_quant=True)``
calibrates per expert and stays close to the dynamic int8 output.
"""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.models.neutron import GeneratorNeutron
from zdcsim.models.neutron_fast import fast_neutron_apply, fold_neutron_params
from zdcsim.models.proton import Generator
from zdcsim.models.proton_fast import fast_generator_apply

B = 8


def _scales_from_amax(amax):
    # replicate the dynamic path's scale arithmetic exactly
    return {k: jnp.maximum(v / 127.0, 1e-12) for k, v in amax.items()}


def test_proton_static_equals_dynamic_at_captured_scales():
    gen = Generator(width=0.25)
    key = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9))
    p = gen.init({"params": jax.random.PRNGKey(7)}, noise, cond, False)["params"]

    amax = {}
    dyn = fast_generator_apply(p, noise, cond, int8=True, amax_out=amax)
    assert set(amax) == {"conv0", "conv1", "conv2"}
    stat = fast_generator_apply(
        p, noise, cond, int8=True, act_scales=_scales_from_amax(amax)
    )
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(stat))


def test_neutron_static_equals_dynamic_at_captured_scales():
    gen = GeneratorNeutron(norm="batch")
    key = jax.random.PRNGKey(3)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (B, 10))
    cond = jax.random.normal(jax.random.fold_in(key, 2), (B, 9))
    variables = gen.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        noise, cond, False,
    )
    folded = fold_neutron_params(variables["params"], variables["batch_stats"])

    amax = {}
    dyn = fast_neutron_apply(folded, noise, cond, int8=True, amax_out=amax)
    assert set(amax) == {"conv0", "conv1", "conv2"}
    stat = fast_neutron_apply(
        folded, noise, cond, int8=True, act_scales=_scales_from_amax(amax)
    )
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(stat))


def test_engine_static_act_quant_close_to_dynamic():
    """FastSim(static_act_quant=True) calibrates per expert and serves
    through the switch path; outputs stay close to dynamic int8 (scales
    differ — calibration batch + margin vs per-call max — so closeness,
    not bit-equality, is the contract)."""
    from zdcsim.config import load_config
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.train.state import init_state

    cfg = load_config(
        overrides=["model.n_experts=2", "model.generator.width=0.25"]
    )
    modules = build_moe(cfg)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    kwargs = dict(batch_size=16, precision="int8", fast=True)
    eng_dyn = FastSim.from_state(modules, state, **kwargs)
    eng_stat = FastSim.from_state(modules, state, static_act_quant=True, **kwargs)
    assert eng_stat._act_scales is not None
    for v in jax.tree_util.tree_leaves(eng_stat._act_scales):
        assert v.shape == (2,) and bool(jnp.all(v > 0))

    cond = np.random.RandomState(0).randn(16, 9).astype(np.float32)
    a = np.asarray(eng_dyn.simulate_switch(cond, jax.random.PRNGKey(1)))
    b = np.asarray(eng_stat.simulate_switch(cond, jax.random.PRNGKey(1)))
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
    assert rel < 0.15, rel
