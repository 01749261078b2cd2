"""Direct unit tests for the on-device tiled-switch MoE dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.inference.switch_dispatch import tiled_switch_decode


def _decoders(e_count, out_shape):
    """Expert e multiplies (noise + cond-sum) by (e+1) — easy to verify."""
    def make(e):
        def decode(z, c):
            base = z.sum(axis=1) + c.sum(axis=1)  # [T]
            return (e + 1.0) * base[:, None, None] * jnp.ones((1, *out_shape))

        return decode

    return [make(e) for e in range(e_count)]


def _reference(idx, cond, noise, e_count, out_shape):
    base = np.asarray(noise).sum(axis=1) + np.asarray(cond).sum(axis=1)
    out = (np.asarray(idx) + 1.0) * base
    return out[:, None, None] * np.ones((1, *out_shape))


@pytest.mark.parametrize("seed,tile", [(0, 4), (1, 8), (2, 16)])
def test_switch_decode_matches_reference(seed, tile):
    key = jax.random.PRNGKey(seed)
    B, E, OUT = 32, 3, (4, 3)
    idx = jax.random.randint(key, (B,), 0, E)
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, 9))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (B, 10))
    got = tiled_switch_decode(_decoders(E, OUT), idx, cond, noise, OUT, tile=tile)
    np.testing.assert_allclose(
        np.asarray(got), _reference(idx, cond, noise, E, OUT), rtol=1e-5, atol=1e-5
    )


def test_switch_decode_all_one_expert():
    B, E, OUT = 16, 4, (2, 2)
    idx = jnp.full((B,), 2)
    cond = jnp.ones((B, 9))
    noise = jnp.ones((B, 10))
    got = tiled_switch_decode(_decoders(E, OUT), idx, cond, noise, OUT, tile=4)
    np.testing.assert_allclose(np.asarray(got), _reference(idx, cond, noise, E, OUT), rtol=1e-5)


def test_switch_decode_empty_experts():
    B, E, OUT = 16, 5, (2, 2)
    idx = jnp.asarray([0, 4] * 8)  # experts 1..3 empty
    cond = jax.random.normal(jax.random.PRNGKey(3), (B, 9))
    noise = jax.random.normal(jax.random.PRNGKey(4), (B, 10))
    got = tiled_switch_decode(_decoders(E, OUT), idx, cond, noise, OUT, tile=4)
    np.testing.assert_allclose(
        np.asarray(got), _reference(idx, cond, noise, E, OUT), rtol=1e-5, atol=1e-5
    )


def test_switch_decode_rejects_indivisible_tile():
    with pytest.raises(ValueError):
        tiled_switch_decode(
            _decoders(2, (2, 2)), jnp.zeros(10, jnp.int32),
            jnp.zeros((10, 9)), jnp.zeros((10, 10)), (2, 2), tile=4,
        )


def test_switch_decode_under_jit():
    B, E, OUT = 16, 3, (3, 2)
    fns = _decoders(E, OUT)

    @jax.jit
    def run(idx, cond, noise):
        return tiled_switch_decode(fns, idx, cond, noise, OUT, tile=8)

    idx = jax.random.randint(jax.random.PRNGKey(5), (B,), 0, E)
    cond = jax.random.normal(jax.random.PRNGKey(6), (B, 9))
    noise = jax.random.normal(jax.random.PRNGKey(7), (B, 10))
    np.testing.assert_allclose(
        np.asarray(run(idx, cond, noise)),
        _reference(idx, cond, noise, E, OUT), rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("seed,tile", [(0, 4), (5, 8)])
def test_switch_decode_in_scan_scatter_bit_matches(seed, tile):
    """in_scan_scatter=True (carry-buffer scatter, no stacked [K,T,*out]
    intermediate) must reproduce the stacked path bit-for-bit."""
    key = jax.random.PRNGKey(seed)
    B, E, OUT = 32, 3, (4, 3)
    idx = jax.random.randint(key, (B,), 0, E)
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, 9))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (B, 10))
    fns = _decoders(E, OUT)
    stacked = tiled_switch_decode(fns, idx, cond, noise, OUT, tile=tile)
    in_scan = tiled_switch_decode(
        fns, idx, cond, noise, OUT, tile=tile, in_scan_scatter=True
    )
    np.testing.assert_array_equal(np.asarray(stacked), np.asarray(in_scan))


@pytest.mark.parametrize("in_scan", [False, True])
def test_switch_decode_dyn_bit_matches(in_scan):
    """decode_dyn (branchless dynamic-gather decoder) must reproduce the
    lax.switch path bit-for-bit in BOTH scan bodies — guards the round-4
    regression where the parameter was accepted but silently ignored."""
    key = jax.random.PRNGKey(11)
    B, E, OUT = 32, 3, (4, 3)
    idx = jax.random.randint(key, (B,), 0, E)
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, 9))
    noise = jax.random.normal(jax.random.fold_in(key, 2), (B, 10))
    fns = _decoders(E, OUT)

    def decode_dyn(e_k, z, c):
        base = z.sum(axis=1) + c.sum(axis=1)
        scale = (e_k + 1.0).astype(base.dtype)
        return scale * base[:, None, None] * jnp.ones((1, *OUT))

    via_switch = tiled_switch_decode(
        fns, idx, cond, noise, OUT, tile=8, in_scan_scatter=in_scan
    )
    via_dyn = tiled_switch_decode(
        fns, idx, cond, noise, OUT, tile=8, in_scan_scatter=in_scan,
        decode_dyn=decode_dyn,
    )
    np.testing.assert_array_equal(np.asarray(via_switch), np.asarray(via_dyn))


def test_switch_decode_dyn_is_called():
    """A decode_dyn whose outputs differ from the branches MUST change the
    result (i.e. the parameter is actually wired into the scan bodies)."""
    B, E, OUT = 16, 2, (2, 2)
    idx = jnp.asarray([0, 1] * 8)
    cond = jnp.ones((B, 9))
    noise = jnp.ones((B, 10))
    marker = lambda e_k, z, c: jnp.full((z.shape[0], *OUT), -123.0)
    got = tiled_switch_decode(
        _decoders(E, OUT), idx, cond, noise, OUT, tile=4, decode_dyn=marker
    )
    np.testing.assert_array_equal(np.asarray(got), -123.0 * np.ones((B, *OUT)))


def test_switch_decode_in_scan_scatter_empty_experts():
    B, E, OUT = 16, 5, (2, 2)
    idx = jnp.asarray([0, 4] * 8)  # experts 1..3 empty
    cond = jax.random.normal(jax.random.PRNGKey(3), (B, 9))
    noise = jax.random.normal(jax.random.PRNGKey(4), (B, 10))
    got = tiled_switch_decode(
        _decoders(E, OUT), idx, cond, noise, OUT, tile=4, in_scan_scatter=True
    )
    np.testing.assert_allclose(
        np.asarray(got), _reference(idx, cond, noise, E, OUT), rtol=1e-5, atol=1e-5
    )


def test_engine_dyn_dispatch_matches_switch():
    """FastSim._build_switch(dyn_dispatch=True) — the branchless dynamic-
    gather decoder — must reproduce the lax.switch serving path on the
    production int8 engine (same weights, same ops, same rounding)."""
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
    eng_sw = FastSim.from_state(modules, state, **kwargs)
    eng_sw._build_switch(tile=8)
    eng_dyn = FastSim.from_state(modules, state, **kwargs)
    eng_dyn._build_switch(tile=8, dyn_dispatch=True)

    cond = np.random.RandomState(1).randn(16, 9).astype(np.float32)
    a = np.asarray(eng_sw.simulate_switch(cond, jax.random.PRNGKey(2)))
    b = np.asarray(eng_dyn.simulate_switch(cond, jax.random.PRNGKey(2)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
