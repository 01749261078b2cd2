import numpy as np
import pytest
from scipy.stats import wasserstein_distance

from zdcsim.ops.ws import masked_wasserstein_1d, wasserstein_1d, wasserstein_per_channel


@pytest.mark.parametrize("n,m", [(100, 100), (128, 64), (50, 173), (3, 7)])
def test_ws_matches_scipy(rng, n, m):
    u = rng.normal(2.0, 3.0, n).astype(np.float32)
    v = rng.normal(0.0, 1.0, m).astype(np.float32)
    expected = wasserstein_distance(u, v)
    got = float(wasserstein_1d(u, v))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_ws_identical_is_zero(rng):
    u = rng.random(64).astype(np.float32)
    assert float(wasserstein_1d(u, u.copy())) == pytest.approx(0.0, abs=1e-6)


def test_ws_per_channel(rng):
    a = rng.normal(size=(200, 5)).astype(np.float32)
    b = rng.normal(loc=1.0, size=(150, 5)).astype(np.float32)
    got = np.asarray(wasserstein_per_channel(a, b))
    expected = [wasserstein_distance(a[:, i], b[:, i]) for i in range(5)]
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_masked_ws_matches_dense_subset(rng):
    u = rng.normal(size=128).astype(np.float32)
    v = rng.normal(loc=0.5, size=128).astype(np.float32)
    u_mask = (rng.random(128) < 0.6).astype(np.float32)
    v_mask = (rng.random(128) < 0.4).astype(np.float32)
    expected = wasserstein_distance(u[u_mask > 0], v[v_mask > 0])
    got = float(masked_wasserstein_1d(u, u_mask, v, v_mask))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_masked_ws_empty_mask_is_zero(rng):
    u = rng.normal(size=64).astype(np.float32)
    v = rng.normal(size=64).astype(np.float32)
    empty = np.zeros(64, np.float32)
    full = np.ones(64, np.float32)
    assert float(masked_wasserstein_1d(u, empty, v, full)) == 0.0
    assert float(masked_wasserstein_1d(u, full, v, empty)) == 0.0
    assert float(masked_wasserstein_1d(u, empty, v, empty)) == 0.0
