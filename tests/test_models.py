"""Shape/dtype/init tests for every model on both geometries, single and
expert-stacked."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.config import load_config
from zdcsim.models import (
    AttentionRouterNetwork,
    AuxReg,
    AuxRegNeutron,
    Discriminator,
    DiscriminatorNeutron,
    Generator,
    GeneratorNeutron,
    RouterNetwork,
    build_model,
    build_moe,
    stack_experts,
)

B, Z, C = 4, 10, 9
KEYS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _init_apply(model, *args, train=True):
    variables = model.init(KEYS, *args, train)
    out, updates = model.apply(
        variables, *args, train, rngs={"dropout": KEYS["dropout"]},
        mutable=["batch_stats"],
    )
    return out, variables


def test_proton_generator_shape():
    noise = jnp.zeros((B, Z))
    cond = jnp.zeros((B, C))
    out, _ = _init_apply(Generator(noise_dim=Z, cond_dim=C), noise, cond)
    assert out.shape == (B, 56, 30, 1)
    assert float(out.min()) >= 0.0  # final ReLU


def test_neutron_generator_shape():
    noise = jnp.zeros((B, Z))
    cond = jnp.zeros((B, C))
    out, _ = _init_apply(GeneratorNeutron(noise_dim=Z, cond_dim=C), noise, cond)
    assert out.shape == (B, 44, 44, 1)


@pytest.mark.parametrize(
    "disc_cls,shape", [(Discriminator, (56, 30)), (DiscriminatorNeutron, (44, 44))]
)
def test_discriminator_shapes(disc_cls, shape):
    img = jnp.ones((B, *shape, 1))
    cond = jnp.zeros((B, C))
    (score, latent), variables = _init_apply(disc_cls(cond_dim=C), img, cond)
    assert score.shape == (B, 1)
    assert latent.shape == (B, 64)
    # spectral norm power-iteration state exists
    assert "batch_stats" in variables


@pytest.mark.parametrize(
    "aux_cls,shape", [(AuxReg, (56, 30)), (AuxRegNeutron, (44, 44))]
)
def test_aux_reg_shapes(aux_cls, shape):
    img = jnp.ones((B, *shape, 1))
    out, _ = _init_apply(aux_cls(), img)
    assert out.shape == (B, 2)


@pytest.mark.parametrize("router_cls", [RouterNetwork, AttentionRouterNetwork])
def test_router_shapes(router_cls):
    cond = jnp.zeros((B, C))
    model = router_cls(n_experts=3)
    variables = model.init(KEYS, cond)
    gates, logits = model.apply(variables, cond)
    assert gates.shape == (B, 3)
    assert logits.shape == (B, 3)
    np.testing.assert_allclose(np.asarray(gates.sum(axis=1)), 1.0, rtol=1e-5)
    # sampled path
    gates_s, _ = model.apply(variables, cond, 1.0, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(gates_s.sum(axis=1)), 1.0, rtol=1e-5)


def test_stacked_experts_are_independent():
    E = 3
    gen = stack_experts(Generator, E, noise_dim=Z, cond_dim=C)
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, Z))
    cond = jax.random.normal(jax.random.PRNGKey(4), (B, C))
    variables = gen.init(KEYS, noise, cond, True)
    out = gen.apply(variables, noise, cond, True, rngs={"dropout": KEYS["dropout"]})
    assert out.shape == (E, B, 56, 30, 1)
    # per-expert params differ (split init rngs) => distinct outputs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # every param leaf carries the expert axis
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(leaf.shape[0] == E for leaf in leaves)


def test_build_model_registry():
    m = build_model("proton.generator", {"noise_dim": Z, "cond_dim": C})
    assert isinstance(m, Generator)
    with pytest.raises(ValueError):
        build_model("nope")


def test_build_moe_from_config():
    cfg = load_config()
    moe = build_moe(cfg)
    assert moe.n_experts == 3
    assert moe.image_shape == (56, 30)
    cond = jnp.zeros((B, C))
    variables = moe.router.init(KEYS, cond)
    gates, _ = moe.router.apply(variables, cond)
    assert gates.shape == (B, 3)


def test_build_moe_neutron_config():
    cfg = load_config(overrides=[
        "model.architecture=neutron",
        "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44,44]",
    ])
    moe = build_moe(cfg)
    assert moe.image_shape == (44, 44)
    noise = jnp.zeros((2, Z))
    cond = jnp.zeros((2, C))
    variables = moe.generator.init(KEYS, noise, cond, True)
    out, _ = moe.generator.apply(
        variables, noise, cond, True,
        rngs={"dropout": KEYS["dropout"]}, mutable=["batch_stats"],
    )
    assert out.shape == (3, 2, 44, 44, 1)


def test_neutron_group_norm_mode():
    """model.norm=group swaps neutron BatchNorm for GroupNorm/LayerNorm:
    no batch_stats collection (batch-independent — exact per-expert
    semantics in the dense train step, see step.py divergence list)."""
    cfg = load_config(overrides=[
        "model.architecture=neutron",
        "model.norm=group",
        "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44,44]",
        "model.n_experts=2",
    ])
    moe = build_moe(cfg)
    noise = jnp.zeros((2, Z))
    cond = jnp.zeros((2, C))
    variables = moe.generator.init(KEYS, noise, cond, True)
    assert "batch_stats" not in variables  # GN/LN keep no running stats
    out = moe.generator.apply(
        variables, noise, cond, True, rngs={"dropout": KEYS["dropout"]}
    )
    assert out.shape == (2, 2, 44, 44, 1)
    img_e = jnp.zeros((2, 2, 44, 44, 1))
    aux_vars = moe.aux_reg.init(KEYS, img_e, True)
    assert "batch_stats" not in aux_vars
    # default stays reference-parity BatchNorm
    cfg_bn = load_config(overrides=[
        "model.architecture=neutron", "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44,44]", "model.n_experts=2",
    ])
    moe_bn = build_moe(cfg_bn)
    v_bn = moe_bn.generator.init(KEYS, noise, cond, True)
    assert "batch_stats" in v_bn


def test_expert_dense_grouped_linear():
    from zdcsim.models.layers import ExpertDense

    E, Bb, I, O = 3, 4, 5, 7
    layer = ExpertDense(n_experts=E, features=O)
    x = jax.random.normal(jax.random.PRNGKey(0), (E, Bb, I))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y = layer.apply(variables, x)
    assert y.shape == (E, Bb, O)
    # matches per-expert matmul
    k = variables["params"]["kernel"]
    b = variables["params"]["bias"]
    ref = jnp.stack([x[e] @ k[e] + b[e, 0] for e in range(E)])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5)
