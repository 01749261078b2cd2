"""Train-step machinery tests on tiny stand-in models (fast on CPU).

Covers: routing/masking semantics, the reference's B_e<=1 expert skip,
router stop-epoch gating, EMA updates, metric shapes, determinism, and the
dense-masked loss equivalence argument (SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.config import load_config
from zdcsim.models.testing import build_tiny_moe
from zdcsim.train.state import init_state, masked_expert_update
from zdcsim.train.step import build_train_step

B = 16
SHAPE = (8, 6)


def tiny_cfg(**over):
    base = ["model.n_experts=3", f"train.batch_size={B}",
            f"dataset.input_image_shape=[{SHAPE[0]}, {SHAPE[1]}]"]
    return load_config(overrides=base + [f"{k}={v}" for k, v in over.items()])


def make_batch(key, b=B, shape=SHAPE):
    ks = jax.random.split(key, 5)
    return {
        "real": jnp.abs(jax.random.normal(ks[0], (b, *shape, 1))),
        "cond": jax.random.normal(ks[1], (b, 9)),
        "std": jax.random.uniform(ks[2], (b, 1)),
        "intensity": jax.random.uniform(ks[3], (b, 1)) * 100,
        "positions": jax.random.uniform(ks[4], (b, 2)) * 6,
    }


def fresh(state):
    """Deep-copy a state: the jitted step donates its input buffers."""
    return jax.tree_util.tree_map(jnp.copy, state)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    return cfg, modules, state, step


def test_step_runs_and_metric_shapes(setup):
    cfg, modules, state, step = setup
    batch = make_batch(jax.random.PRNGKey(1))
    step_before = int(state.step)
    new_state, m = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert int(new_state.step) == step_before + 1
    for k in ("gen_loss", "disc_loss", "div_loss", "intensity_loss", "aux_reg_loss",
              "router_loss", "gan_loss", "adaptive_load_balancing_loss", "tau"):
        assert m[k].shape == (), k
        assert np.isfinite(float(m[k])), k
    for k in ("gen_loss_experts", "disc_loss_experts", "n_choosen_experts_mean_epoch"):
        assert m[k].shape == (3,), k
    # class shares sum to 1
    assert np.isclose(float(jnp.sum(m["n_choosen_experts_mean_epoch"])), 1.0)


def test_step_deterministic(setup):
    cfg, modules, state, step = setup
    batch = make_batch(jax.random.PRNGKey(1))
    _, m1 = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    _, m2 = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    np.testing.assert_allclose(float(m1["gen_loss"]), float(m2["gen_loss"]), rtol=1e-6)


def test_parameters_change_and_ema_tracks(setup):
    cfg, modules, state, step = setup
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, _ = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    # at least one gen leaf changed
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.gen.params, new_state.gen.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    # EMA moved toward new params but is not equal to them
    ema_diff = jax.tree_util.tree_map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))),
        new_state.ema_gen_params, new_state.gen.params,
    )
    assert max(jax.tree_util.tree_leaves(ema_diff)) > 0


def test_router_frozen_after_stop_epoch(setup):
    cfg, modules, state, step = setup
    batch = make_batch(jax.random.PRNGKey(1))
    stop = int(cfg.model.router.stop_router_training_epoch)  # 40
    new_state, m = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(stop + 1))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.router.params, new_state.router.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    assert float(m["router_loss"]) == 0.0  # reference zeroes the metric too
    # before the stop epoch the router does move
    new_state2, m2 = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    diffs2 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.router.params, new_state2.router.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs2)) > 0.0


def test_single_expert_no_router_loss():
    cfg = tiny_cfg(**{"model.n_experts": 1})
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    batch = make_batch(jax.random.PRNGKey(1))
    _, m = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert float(m["router_loss"]) == 0.0
    assert float(m["n_choosen_experts_mean_epoch"][0]) == 1.0


def test_tau_schedule_in_metrics(setup):
    cfg, modules, state, step = setup
    batch = make_batch(jax.random.PRNGKey(1))
    _, m0 = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    _, m100 = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(100))
    assert np.isclose(float(m0["tau"]), 1.2, atol=1e-5)
    assert np.isclose(float(m100["tau"]), 0.8, atol=1e-5)  # floor tau_min


def test_masked_expert_update_freezes_inactive():
    import optax

    cfg = tiny_cfg()
    tx = optax.adam(0.1)
    params = {"w": jnp.ones((3, 4))}
    opt_state = tx.init(params)
    from zdcsim.train.state import Component

    comp = Component(params=params, stats={}, opt_state=opt_state)
    grads = {"w": jnp.ones((3, 4))}
    active = jnp.array([True, False, True])
    new = masked_expert_update(tx, comp, grads, active)
    # expert 1 untouched, experts 0/2 moved
    np.testing.assert_array_equal(np.asarray(new.params["w"][1]), np.ones(4))
    assert float(jnp.max(jnp.abs(new.params["w"][0] - 1.0))) > 0
    assert float(jnp.max(jnp.abs(new.params["w"][2] - 1.0))) > 0
    # adam moments of inactive expert stay zero
    mu = new.opt_state[0].mu["w"]
    np.testing.assert_array_equal(np.asarray(mu[1]), np.zeros(4))
    assert float(jnp.max(jnp.abs(mu[0]))) > 0


def test_training_reduces_disc_loss_on_toy_distribution():
    """A few steps of training should move losses without NaNs (integration
    sanity; fidelity is covered by the slow end-to-end test)."""
    cfg = tiny_cfg()
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    key = jax.random.PRNGKey(3)
    for i in range(5):
        batch = make_batch(jax.random.fold_in(key, i))
        state, m = step(state, batch, jax.random.fold_in(key, 100 + i), jnp.asarray(0))
        assert np.isfinite(float(m["gen_loss"]))
        assert np.isfinite(float(m["disc_loss"]))


def test_router_gan_term_gradient_flag():
    """differentiable_gan_term=True routes gradient to the router through the
    ST gates; False reproduces the reference's detached (constant) GAN term
    (moe.py:176-207) — with all other router losses off, the router must not
    move."""
    common = {
        "model.router.alb_strength": 0, "model.router.diff_strength": 0,
        "model.router.util_strength": 0, "model.router.ed_strength": 0,
        "model.router.gan_strength": 0.1,
    }
    batch = make_batch(jax.random.PRNGKey(1))

    def router_moved(differentiable):
        cfg = tiny_cfg(**common, **{"model.router.differentiable_gan_term": differentiable})
        modules = build_tiny_moe(cfg, SHAPE)
        state = init_state(modules, cfg, jax.random.PRNGKey(0))
        step = build_train_step(modules, cfg)
        new_state, _ = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.router.params, new_state.router.params,
        )
        return max(jax.tree_util.tree_leaves(diffs)) > 0

    assert router_moved(True)
    assert not router_moved(False)


def test_bf16_training_step_runs():
    cfg = tiny_cfg(**{"train.precision": "bf16"})
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    step = build_train_step(modules, cfg)
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, m = step(fresh(state), batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(m["gen_loss"]))
    # master params stay f32
    leaf = jax.tree_util.tree_leaves(new_state.gen.params)[0]
    assert leaf.dtype == jnp.float32
    # close to the f32 step on the same batch (bf16 rounding tolerance)
    cfg32 = tiny_cfg()
    modules32 = build_tiny_moe(cfg32, SHAPE)
    state32 = init_state(modules32, cfg32, jax.random.PRNGKey(0))
    step32 = build_train_step(modules32, cfg32)
    _, m32 = step32(state32, batch, jax.random.PRNGKey(2), jnp.asarray(0))
    np.testing.assert_allclose(float(m["disc_loss"]), float(m32["disc_loss"]), rtol=0.1, atol=0.05)


def test_remat_step_matches_plain():
    cfg_r = tiny_cfg(**{"train.remat": True})
    cfg_p = tiny_cfg()
    batch = make_batch(jax.random.PRNGKey(1))

    def run(cfg):
        modules = build_tiny_moe(cfg, SHAPE)
        state = init_state(modules, cfg, jax.random.PRNGKey(0))
        step = build_train_step(modules, cfg)
        _, m = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
        return float(m["gen_loss"]), float(m["disc_loss"])

    g_r, d_r = run(cfg_r)
    g_p, d_p = run(cfg_p)
    np.testing.assert_allclose(g_r, g_p, rtol=1e-5)
    np.testing.assert_allclose(d_r, d_p, rtol=1e-5)


def test_switch_dispatch_step_matches_dense():
    """train.dispatch=switch (single-expert-FLOPs tiled dispatch) must
    reproduce the dense step's losses, metrics, and parameter updates — the
    dense step's unrouted (sample, expert) work is exactly the part the
    masked losses zero out. Constant router GAN term in both arms (the one
    documented semantic difference is thereby removed); tiny models have no
    dropout/stats, so results differ only by fp reduction order."""
    cfg_d = tiny_cfg(**{"model.router.differentiable_gan_term": "false"})
    cfg_s = tiny_cfg(**{
        "model.router.differentiable_gan_term": "false",
        "train.dispatch": "switch", "train.dispatch_tile": 4,
    })
    modules = build_tiny_moe(cfg_d, SHAPE)
    state = init_state(modules, cfg_d, jax.random.PRNGKey(0))
    step_d = build_train_step(modules, cfg_d)
    step_s = build_train_step(modules, cfg_s)
    batch = make_batch(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)

    sd, md = step_d(fresh(state), batch, key, jnp.asarray(0))
    ss, ms = step_s(fresh(state), batch, key, jnp.asarray(0))

    for k in ("gen_loss", "disc_loss", "div_loss", "intensity_loss",
              "aux_reg_loss", "router_loss", "gan_loss"):
        np.testing.assert_allclose(
            np.asarray(md[k]), np.asarray(ms[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k} dense vs switch",
        )
    np.testing.assert_array_equal(
        np.asarray(md["n_choosen_experts_mean_epoch"]),
        np.asarray(ms["n_choosen_experts_mean_epoch"]),
    )
    for name, cd, cs in (("gen", sd.gen, ss.gen), ("disc", sd.disc, ss.disc),
                         ("aux", sd.aux, ss.aux), ("router", sd.router, ss.router)):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(cd.params),
            jax.tree_util.tree_leaves_with_path(cs.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
                err_msg=f"{name} params {pa} dense vs switch",
            )


def test_switch_dispatch_multiple_steps_stay_close():
    """Two chained switch steps track dense (no drift blow-up)."""
    cfg_s = tiny_cfg(**{
        "model.router.differentiable_gan_term": "false",
        "train.dispatch": "switch", "train.dispatch_tile": 8,
    })
    cfg_d = tiny_cfg(**{"model.router.differentiable_gan_term": "false"})
    modules = build_tiny_moe(cfg_s, SHAPE)
    state = init_state(modules, cfg_s, jax.random.PRNGKey(0))
    step_s = build_train_step(modules, cfg_s)
    step_d = build_train_step(modules, cfg_d)
    sd, ss = fresh(state), fresh(state)
    for t in range(2):
        batch = make_batch(jax.random.PRNGKey(10 + t))
        sd, md = step_d(sd, batch, jax.random.PRNGKey(20 + t), jnp.asarray(t))
        ss, ms = step_s(ss, batch, jax.random.PRNGKey(20 + t), jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(md["gen_loss"]), np.asarray(ms["gen_loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(md["disc_loss"]), np.asarray(ms["disc_loss"]), rtol=1e-3
    )
