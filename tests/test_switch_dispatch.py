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
