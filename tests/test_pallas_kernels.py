"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.ops.channels import sum_channels
from zdcsim.ops.pallas_kernels import expm1_channel_sums, routed_expm1_channel_sums


@pytest.mark.parametrize("shape", [(8, 6), (56, 30), (44, 44)])
def test_routed_epilogue_matches_reference(rng, shape):
    E, B = 3, 8
    imgs = jnp.asarray(rng.random((E, B, *shape)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, E, B), jnp.int32)
    got = routed_expm1_channel_sums(imgs, idx, interpret=True)
    sel = jnp.take_along_axis(imgs, idx[None, :, None, None], axis=0)[0]
    exp = sum_channels(jnp.expm1(sel))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-5)


def test_plain_epilogue_matches_reference(rng):
    imgs = jnp.asarray(rng.random((10, 8, 6)), jnp.float32)
    got = expm1_channel_sums(imgs, interpret=True)
    exp = sum_channels(jnp.expm1(imgs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-5)
