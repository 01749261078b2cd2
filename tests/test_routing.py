import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.ops.routing import class_share, expert_masks, gumbel_softmax, straight_through_gates


def test_gumbel_softmax_is_distribution():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    gates = gumbel_softmax(key, logits, tau=1.0)
    np.testing.assert_allclose(np.asarray(gates.sum(axis=1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(gates) >= 0)


def test_gumbel_softmax_hard_is_onehot():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    gates = gumbel_softmax(key, logits, tau=1.0, hard=True)
    arr = np.asarray(gates)
    np.testing.assert_allclose(arr.sum(axis=1), 1.0, rtol=1e-5)
    assert np.all(np.isclose(arr, 0, atol=1e-6) | np.isclose(arr, 1, atol=1e-6))


def test_gumbel_low_tau_concentrates():
    """As tau -> 0, gates approach the argmax one-hot of (logits + gumbel)."""
    key = jax.random.PRNGKey(2)
    logits = jnp.array([[10.0, 0.0, -10.0]] * 8)
    gates = gumbel_softmax(key, logits, tau=0.01)
    assert np.asarray(gates[:, 0]).min() > 0.99


def test_straight_through_gradient_flows_via_soft():
    logits = jnp.array([[2.0, 1.0, 0.0]])

    def f(lg):
        soft = jax.nn.softmax(lg, axis=-1)
        gates, _ = straight_through_gates(soft)
        return jnp.sum(gates * jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(f)(logits)
    soft = jax.nn.softmax(logits, axis=-1)
    # forward value uses the hard one-hot
    val = f(logits)
    assert float(val) == pytest.approx(1.0)
    # gradient equals the softmax jacobian-vector product (soft path)
    def f_soft(lg):
        return jnp.sum(jax.nn.softmax(lg, axis=-1) * jnp.array([1.0, 2.0, 3.0]))

    g_soft = jax.grad(f_soft)(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_soft), rtol=1e-5)


def test_expert_masks_and_class_share():
    idx = jnp.array([0, 1, 1, 2, 2, 2, 0, 1])
    masks = np.asarray(expert_masks(idx, 3))
    assert masks.shape == (3, 8)
    assert masks.sum() == 8
    np.testing.assert_array_equal(masks[0], [1, 0, 0, 0, 0, 0, 1, 0])
    share = np.asarray(class_share(idx, 3))
    np.testing.assert_allclose(share, [2 / 8, 3 / 8, 3 / 8])
