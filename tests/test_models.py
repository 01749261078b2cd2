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
    GeneratorNeutronV2,
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


def test_neutron_generator_v2_shape():
    noise = jnp.zeros((B, Z))
    cond = jnp.zeros((B, C))
    out, _ = _init_apply(GeneratorNeutronV2(noise_dim=Z, cond_dim=C), noise, cond)
    assert out.shape == (B, 44, 44, 1)
    assert float(out.min()) >= 0.0  # final ReLU


def test_neutron_generator_v2_rejects_batch_norm():
    with pytest.raises(ValueError, match="norm"):
        _init_apply(
            GeneratorNeutronV2(noise_dim=Z, cond_dim=C, norm="batch"),
            jnp.zeros((B, Z)), jnp.zeros((B, C)),
        )


def test_build_moe_neutron_v2_config():
    """model.generator.version=v2 under the neutron preset builds the
    proton-recipe 44x44 generator family end to end (stacked + single)."""
    cfg = load_config(overrides=[
        "model.architecture=neutron",
        "model.norm=group",
        "model.generator.version=v2",
        "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44,44]",
    ])
    moe = build_moe(cfg)
    assert moe.names["generator"] == "GeneratorNeutronV2"
    assert moe.generator_masked is None  # batch-independent norms
    noise = jnp.zeros((2, Z))
    cond = jnp.zeros((2, C))
    variables = moe.generator.init(KEYS, noise, cond, True)
    out = moe.generator.apply(
        variables, noise, cond, True, rngs={"dropout": KEYS["dropout"]}
    )
    assert out.shape == (3, 2, 44, 44, 1)


def test_build_moe_rejects_unknown_generator_version():
    cfg = load_config(overrides=["model.generator.version=v9"])
    with pytest.raises(ValueError, match="v9"):
        build_moe(cfg)


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


def test_masked_batchnorm_equals_subset_forward():
    """MaskedBatchNorm with a routing mask == plain BN on the subset rows
    (the reference's per-sub-batch statistics, moe.py:121-207)."""
    from zdcsim.models.layers import MaskedBatchNorm

    rng = jax.random.PRNGKey(3)
    for shape in [(10, 7), (10, 5, 4, 3)]:
        x = jax.random.normal(jax.random.fold_in(rng, len(shape)), shape) * 3.0 + 1.5
        mask = jnp.asarray([1, 0, 1, 1, 0, 1, 0, 0, 1, 1], jnp.float32)
        sub = np.flatnonzero(np.asarray(mask))
        layer = MaskedBatchNorm()
        variables = layer.init(jax.random.PRNGKey(0), x, mask, True)
        # give scale/bias non-trivial values
        variables = {
            "params": {
                "scale": jnp.full_like(variables["params"]["scale"], 1.7),
                "bias": jnp.full_like(variables["params"]["bias"], -0.3),
            },
            "batch_stats": variables["batch_stats"],
        }
        y_masked, upd = layer.apply(
            variables, x, mask, True, mutable=["batch_stats"]
        )
        y_subset, upd_sub = layer.apply(
            variables, x[sub], None, True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(y_masked[sub]), np.asarray(y_subset), rtol=2e-5, atol=2e-5
        )
        # running stats updated from the SAME (subset) statistics
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd["batch_stats"][k]),
                np.asarray(upd_sub["batch_stats"][k]),
                rtol=2e-5, atol=2e-5,
            )
        # eval mode ignores the mask and uses running averages
        ye_m = layer.apply(
            {"params": variables["params"], **upd}, x, mask, False
        )
        ye_n = layer.apply(
            {"params": variables["params"], **upd}, x, None, False
        )
        np.testing.assert_allclose(np.asarray(ye_m), np.asarray(ye_n), rtol=1e-6)


def test_neutron_generator_masked_bn_subset_stats():
    """The mask threads through GeneratorNeutron: the first BN layer's
    updated running stats equal those of a forward on only the masked rows
    (first layer is upstream of any dropout, so stats must match exactly)."""
    gen = GeneratorNeutron(noise_dim=Z, cond_dim=C)
    noise = jax.random.normal(jax.random.PRNGKey(0), (6, Z))
    cond = jax.random.normal(jax.random.PRNGKey(1), (6, C))
    mask = jnp.asarray([1, 1, 0, 0, 1, 0], jnp.float32)
    sub = np.flatnonzero(np.asarray(mask))
    variables = gen.init(KEYS, noise, cond, True)
    _, upd = gen.apply(
        variables, noise, cond, True, mask,
        rngs={"dropout": KEYS["dropout"]}, mutable=["batch_stats"],
    )
    _, upd_sub = gen.apply(
        variables, noise[sub], cond[sub], True, None,
        rngs={"dropout": KEYS["dropout"]}, mutable=["batch_stats"],
    )
    bn0 = upd["batch_stats"]["MaskedBatchNorm_0"]
    bn0_sub = upd_sub["batch_stats"]["MaskedBatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(bn0["mean"]), np.asarray(bn0_sub["mean"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bn0["var"]), np.asarray(bn0_sub["var"]), rtol=1e-5, atol=1e-6
    )


def test_build_moe_neutron_masked_stacking():
    """neutron norm=batch builds mask-aware G/aux stackings that share the
    mask-free parameter pytree (one train state serves both)."""
    from zdcsim.config import load_config
    from zdcsim.models import build_moe

    cfg = load_config(overrides=[
        "model.architecture=neutron", "dataset.zdc_type=neutron",
        "dataset.input_image_shape=[44,44]", "model.n_experts=2",
    ])
    moe = build_moe(cfg)
    assert moe.generator_masked is not None and moe.aux_reg_masked is not None
    E, Bb = 2, 4
    noise = jax.random.normal(jax.random.PRNGKey(0), (Bb, Z))
    cond = jax.random.normal(jax.random.PRNGKey(1), (Bb, C))
    masks = jnp.asarray([[1, 1, 0, 0], [0, 0, 1, 1]], jnp.float32)  # [E, B]
    variables = moe.generator.init(KEYS, noise, cond, True)  # mask-free init
    out, upd = moe.generator_masked.apply(
        variables, noise, cond, True, masks,
        rngs={"dropout": KEYS["dropout"]}, mutable=["batch_stats"],
    )
    assert out.shape == (E, Bb, 44, 44, 1)
    # group mode builds no masked variants
    cfg_gn = load_config(overrides=[
        "model.architecture=neutron", "model.norm=group",
        "dataset.zdc_type=neutron", "dataset.input_image_shape=[44,44]",
        "model.n_experts=2",
    ])
    moe_gn = build_moe(cfg_gn)
    assert moe_gn.generator_masked is None and moe_gn.aux_reg_masked is None


def test_masked_batchnorm_zeroes_unrouted_rows():
    """Unrouted rows must come out EXACTLY zero (dead rows stay bounded —
    see MaskedBatchNorm docstring; the round-3 neutron NaN)."""
    from zdcsim.models.layers import MaskedBatchNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 5)) * 100.0  # wild rows
    mask = jnp.asarray([1, 0, 1, 0, 1, 0, 1, 0], jnp.float32)
    layer = MaskedBatchNorm()
    variables = layer.init(jax.random.PRNGKey(1), x, mask, True)
    y, _ = layer.apply(variables, x, mask, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y)[1::2], 0.0)
    assert np.abs(np.asarray(y)[::2]).max() > 0.0


def test_resize_nearest_matmul_exact():
    """The one-hot-matmul resize must be BIT-identical to jax.image.resize
    nearest for float dtypes (each output element is 1.0 * x[src] summed
    with true zeros — exact in any float dtype), across upscale, downscale,
    and the production 35x19 -> 56x30 shape, and must differentiate without
    gather/scatter (grad check: sum-of-output grads count source fan-out)."""
    from zdcsim.models.layers import resize_nearest

    for dtype in (jnp.float32, jnp.bfloat16):
        for (h, w), (H, W) in [
            ((35, 19), (56, 30)),  # proton generator production shape
            ((18, 10), (36, 20)),  # integer-factor path (broadcast)
            ((20, 20), (13, 17)),  # downscale
            ((7, 5), (11, 4)),     # mixed up/down
        ]:
            x = jax.random.normal(jax.random.PRNGKey(0), (3, h, w, 2)).astype(dtype)
            got = resize_nearest(x, (H, W))
            ref = jax.image.resize(x, (3, H, W, 2), method="nearest")
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # gradient: d(sum(out))/dx[i,j] == number of output pixels mapping to it
    x32 = jax.random.normal(jax.random.PRNGKey(1), (1, 35, 19, 1))
    g_got = jax.grad(lambda t: resize_nearest(t, (56, 30)).sum())(x32)
    g_ref = jax.grad(
        lambda t: jax.image.resize(t, (1, 56, 30, 1), method="nearest").sum()
    )(x32)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref))
