"""Evaluator, inference engine, and checkpoint tests on tiny models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.config import load_config
from zdcsim.models.testing import build_tiny_moe
from zdcsim.train.evaluate import build_evaluator
from zdcsim.train.state import init_state

SHAPE = (8, 6)


def tiny_cfg(**over):
    base = ["model.n_experts=3", "train.batch_size=16",
            f"dataset.input_image_shape=[{SHAPE[0]}, {SHAPE[1]}]"]
    return load_config(overrides=base + [f"{k}={v}" for k, v in over.items()])


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    return cfg, modules, state


def test_evaluator_ws_metrics(setup):
    cfg, modules, state = setup
    n = 64
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    evaluator = build_evaluator(modules, cfg, chunk_size=32)
    m = evaluator(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    assert np.isfinite(m["ws_mean"]) and m["ws_mean"] >= 0
    assert m["ws_mean_exp"].shape == (3,)
    assert int(m["eval_expert_counts"].sum()) == n
    # epoch 0 -> n_calc = 1 -> std over runs is 0
    assert m["ws_std"] == 0.0


def test_evaluator_nruns_schedule(setup):
    cfg, modules, state = setup
    n = 32
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    evaluator = build_evaluator(modules, cfg, chunk_size=32)
    m = evaluator(state, test_arrays, epoch=25, key=jax.random.PRNGKey(3))
    # epoch 25 -> n_calc = min(25//5+1, 5) = 5 runs -> nonzero run-to-run std
    assert m["ws_std"] >= 0.0


def test_ws_identical_distributions_near_zero(setup):
    """WS of a generator against its own output distribution ~ 0."""
    cfg, modules, state = setup
    n = 128
    cond = jax.random.normal(jax.random.PRNGKey(2), (n, 9))
    # build "real" images from the same generator the evaluator uses
    noise = jax.random.normal(jax.random.PRNGKey(5), (n, modules.noise_dim))
    imgs = modules.generator.apply({"params": state.gen.params}, noise, cond, False)
    _, logits = modules.router.apply({"params": state.router.params}, cond)
    idx = jnp.argmax(logits, axis=-1)
    real = jnp.take_along_axis(imgs, idx[None, :, None, None, None], axis=0)[0]
    evaluator = build_evaluator(modules, cfg, chunk_size=128)
    m = evaluator(state, {"real": real, "cond": cond}, epoch=0, key=jax.random.PRNGKey(3))
    # identical conditional distribution, finite-sample fluctuation only
    assert m["ws_mean"] < 1.0


def test_fastsim_engine(setup):
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=32)
    cond = np.random.default_rng(0).normal(size=(50, 9)).astype(np.float32)
    showers, experts = engine.simulate(cond, jax.random.PRNGKey(0), return_experts=True)
    assert showers.shape == (50, *SHAPE)
    assert experts.shape == (50,)
    assert float(jnp.min(showers)) >= 0.0  # expm1(relu(...)) >= 0
    # deterministic routing: same cond -> same experts
    _, experts2 = engine.simulate(cond, jax.random.PRNGKey(9), return_experts=True)
    np.testing.assert_array_equal(np.asarray(experts), np.asarray(experts2))


def test_fastsim_bf16(setup):
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=32, precision="bf16")
    cond = np.zeros((32, 9), np.float32)
    showers = engine.simulate(cond, jax.random.PRNGKey(0))
    assert showers.dtype == jnp.float32  # outputs upcast


def test_checkpoint_roundtrip(setup, tmp_path):
    from zdcsim.train.checkpoint import latest_epoch, restore_checkpoint, save_checkpoint

    cfg, modules, state = setup
    d = str(tmp_path / "models")
    save_checkpoint(d, 7, state)
    assert latest_epoch(d) == 7
    template = init_state(modules, cfg, jax.random.PRNGKey(42))
    restored = restore_checkpoint(d, 7, template)
    same = jax.tree_util.tree_map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), state.gen.params,
        restored.gen.params,
    )
    assert all(jax.tree_util.tree_leaves(same))
    assert int(restored.step) == int(state.step)


def test_fastsim_grouped_dispatch(setup):
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=32)
    cond = np.random.default_rng(1).normal(size=(70, 9)).astype(np.float32)
    dense, experts = engine.simulate(cond, jax.random.PRNGKey(0), return_experts=True)
    grouped = engine.simulate_grouped(cond, jax.random.PRNGKey(0))
    assert grouped.shape == (70, *SHAPE)
    assert grouped.min() >= 0.0
    # grouped uses the same router as dense
    idx = np.asarray(engine._route(engine._weights, jnp.asarray(cond)))
    np.testing.assert_array_equal(idx, np.asarray(experts))


def test_fastsim_switch_dispatch_matches_dense(setup):
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=64)
    engine._build_switch(tile=16)
    cond = np.random.default_rng(3).normal(size=(64, 9)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    dense, idx_d = engine.simulate(cond, key, return_experts=True)
    sw, idx_s = engine.simulate_switch(cond, key, return_experts=True)
    np.testing.assert_array_equal(np.asarray(idx_d), np.asarray(idx_s))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sw), rtol=1e-5, atol=1e-5)
    # skewed routing (all samples to one expert)
    cond2 = np.tile(cond[:1], (64, 1))
    np.testing.assert_allclose(
        np.asarray(engine.simulate(cond2, key)),
        np.asarray(engine.simulate_switch(cond2, key)),
        rtol=1e-5, atol=1e-5,
    )


def test_checkpoint_saver_threshold(setup, tmp_path):
    from zdcsim.train.hooks import CheckpointSaver

    cfg, modules, state = setup
    saver = CheckpointSaver(str(tmp_path / "m"), ws_threshold=3.0)
    saver.on_epoch_end(0, {"ws_mean": 5.0}, state)   # above threshold: no save
    assert saver.saved_epochs == []
    saver.on_epoch_end(1, {"ws_mean": 2.5}, state)   # below: saves
    assert saver.saved_epochs == [1]
    saver.on_epoch_end(2, {}, state)                  # no ws metric: no save
    assert saver.saved_epochs == [1]


def test_checkpoint_saver_keep_best(setup, tmp_path):
    """keep_best retains only the k lowest-WS checkpoints on disk."""
    import os

    from zdcsim.train.checkpoint import CKPT_PREFIX
    from zdcsim.train.hooks import CheckpointSaver

    cfg, modules, state = setup
    d = str(tmp_path / "m")
    saver = CheckpointSaver(d, ws_threshold=100.0, keep_best=2)
    saver.on_epoch_end(0, {"ws_mean": 50.0}, state)
    saver.on_epoch_end(1, {"ws_mean": 30.0}, state)
    saver.on_epoch_end(2, {"ws_mean": 40.0}, state)  # evicts epoch 0 (ws=50)
    saver.on_train_end([])
    on_disk = sorted(
        int(n[len(CKPT_PREFIX):]) for n in os.listdir(d) if n.startswith(CKPT_PREFIX)
    )
    assert on_disk == [1, 2]


def test_checkpoint_saver_async_roundtrip(setup, tmp_path):
    """Async saves land on disk after close() and restore identically."""
    import numpy as _np

    from zdcsim.train.checkpoint import restore_checkpoint
    from zdcsim.train.hooks import CheckpointSaver
    from zdcsim.train.state import init_state

    cfg, modules, state = setup
    d = str(tmp_path / "m")
    saver = CheckpointSaver(d, ws_threshold=100.0, use_async=True)
    saver.on_epoch_end(3, {"ws_mean": 10.0}, state)
    saver.on_train_end([])
    template = init_state(modules, cfg, jax.random.PRNGKey(9))
    restored = restore_checkpoint(d, 3, template)
    a = jax.tree_util.tree_leaves(state.gen.params)[0]
    b = jax.tree_util.tree_leaves(restored.gen.params)[0]
    _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))


def test_evaluator_router_classification(setup):
    cfg, modules, state = setup
    n = 64
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    evaluator = build_evaluator(modules, cfg, chunk_size=64)
    # labels = the router's own assignments -> perfect accuracy
    _, logits = modules.router.apply({"params": state.router.params}, test_arrays["cond"])
    labels = np.asarray(jnp.argmax(logits, axis=-1))
    m = evaluator(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3),
                  expert_labels=labels)
    assert m["router_accuracy"] == 1.0
    # shuffled labels -> below perfect
    m2 = evaluator(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3),
                   expert_labels=np.roll(labels, 7))
    assert m2["router_accuracy"] < 1.0


def test_evaluator_switch_matches_dense(setup):
    """The switch-dispatch eval path must reproduce the dense path exactly."""
    import dataclasses

    cfg, modules, state = setup
    n = 128
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    ev_switch = build_evaluator(modules, cfg, chunk_size=128)  # 128 % 64 == 0 -> switch
    modules_dense = dataclasses.replace(modules, generator_single=None)  # forces dense
    ev_dense = build_evaluator(modules_dense, cfg, chunk_size=128)
    m_s = ev_switch(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    m_d = ev_dense(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(m_s["ws_mean"], m_d["ws_mean"], rtol=1e-5)
    np.testing.assert_allclose(m_s["ws_mean_exp"], m_d["ws_mean_exp"], rtol=1e-5)


def test_evaluator_normalized_fidelity_metrics(setup):
    """ws_mean_rel (scale-normalized W1) and ws_real_floor (real-vs-real
    finite-sample floor) make fidelity comparable across datasets."""
    cfg, modules, state = setup
    n = 128
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    evaluator = build_evaluator(modules, cfg, chunk_size=64)
    m = evaluator(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    assert m["ws_mean_rel"] > 0 and np.isfinite(m["ws_mean_rel"])
    assert m["ws_real_floor"] >= 0 and np.isfinite(m["ws_real_floor"])
    # the floor is a property of the data only — far below an untrained model
    assert m["ws_real_floor"] < m["ws_mean"]


def test_evaluator_covers_full_test_set(setup):
    """A test set that is not a multiple of chunk_size must still be fully
    evaluated (the final partial chunk is padded, not dropped)."""
    cfg, modules, state = setup
    n = 50  # chunk_size=32 -> one full chunk + 18 remainder
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    evaluator = build_evaluator(modules, cfg, chunk_size=32)
    m = evaluator(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    assert int(m["eval_expert_counts"].sum()) == n
    assert np.isfinite(m["ws_mean"])


def test_evaluator_sample_routing(setup):
    """eval.sample_routing=true reproduces the reference's stochastic
    (gumbel-perturbed) eval routing (moe.py:650); default argmax routing is
    key-independent."""
    cfg, modules, state = setup
    n = 256
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)) * 0.1,
    }
    cfg_s = tiny_cfg(**{"eval.sample_routing": "true"})
    ev_sample = build_evaluator(modules, cfg_s, chunk_size=128)
    m1 = ev_sample(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    m2 = ev_sample(state, test_arrays, epoch=0, key=jax.random.PRNGKey(4))
    # near-uniform logits + gumbel noise: assignments differ across keys
    assert not np.array_equal(m1["eval_expert_counts"], m2["eval_expert_counts"])
    assert np.isfinite(m1["ws_mean"])
    ev_det = build_evaluator(modules, tiny_cfg(), chunk_size=128)
    d1 = ev_det(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    d2 = ev_det(state, test_arrays, epoch=0, key=jax.random.PRNGKey(4))
    np.testing.assert_array_equal(d1["eval_expert_counts"], d2["eval_expert_counts"])


def test_evaluator_fused_epilogue_matches_xla(setup):
    """eval.fused_epilogue=true (Pallas expm1+channel-sum) must reproduce the
    XLA path's metrics exactly (interpret mode on CPU; compiled on TPU)."""
    cfg, modules, state = setup
    n = 64
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    ev_xla = build_evaluator(modules, tiny_cfg(), chunk_size=64)
    ev_pl = build_evaluator(
        modules, tiny_cfg(**{"eval.fused_epilogue": "true"}), chunk_size=64
    )
    m_x = ev_xla(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    m_p = ev_pl(state, test_arrays, epoch=0, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(m_p["ws_mean"], m_x["ws_mean"], rtol=1e-5)
    np.testing.assert_allclose(m_p["ws_mean_exp"], m_x["ws_mean_exp"], rtol=1e-5)


def test_fastsim_bulk_matches_switch(setup):
    """simulate_bulk (one lax.scan program) must reproduce simulate_switch
    (per-chunk dispatch) bit-for-bit — same per-chunk key derivation."""
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=32)
    cond = np.random.default_rng(9).normal(size=(80, 9)).astype(np.float32)
    key = jax.random.PRNGKey(4)
    sw, idx_s = engine.simulate_switch(cond, key, return_experts=True)
    bk, idx_b = engine.simulate_bulk(cond, key, return_experts=True)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_b))
    np.testing.assert_allclose(np.asarray(sw), np.asarray(bk), rtol=1e-6, atol=1e-6)


def test_fastsim_switch_odd_batch(setup):
    """simulate_switch must handle batch sizes the tile does not divide."""
    from zdcsim.inference import FastSim

    cfg, modules, state = setup
    engine = FastSim.from_state(modules, state, batch_size=50)  # gcd(50,128)=2
    engine._build_switch(tile=128)
    cond = np.random.default_rng(5).normal(size=(50, 9)).astype(np.float32)
    out = engine.simulate_switch(cond, jax.random.PRNGKey(0))
    assert np.asarray(out).shape == (50, *SHAPE)


def test_evaluator_bulk_matches_perchunk(setup):
    """eval.bulk (whole eval epoch in ONE XLA program) must reproduce the
    per-chunk dispatch path: same split/fold_in key sequence -> identical
    routing, channel sums, and W1 metrics."""
    cfg, modules, state = setup
    n = 80  # chunk_size=32 -> 2 full chunks + padded remainder
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    ev_bulk = build_evaluator(modules, tiny_cfg(), chunk_size=32)
    ev_chunk = build_evaluator(
        modules, tiny_cfg(**{"eval.bulk": "false"}), chunk_size=32
    )
    for epoch in (0, 25):  # n_calc = 1 and 5
        m_b = ev_bulk(state, test_arrays, epoch=epoch, key=jax.random.PRNGKey(3))
        m_c = ev_chunk(state, test_arrays, epoch=epoch, key=jax.random.PRNGKey(3))
        np.testing.assert_array_equal(
            m_b["eval_expert_counts"], m_c["eval_expert_counts"]
        )
        np.testing.assert_allclose(m_b["ws_mean"], m_c["ws_mean"], rtol=1e-6)
        np.testing.assert_allclose(m_b["ws_std"], m_c["ws_std"], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            m_b["ws_mean_exp"], m_c["ws_mean_exp"], rtol=1e-6
        )
        np.testing.assert_allclose(
            m_b["ws_real_floor"], m_c["ws_real_floor"], rtol=1e-6
        )


def test_eval_figures_include_pca_tsne(setup, tmp_path):
    """generate_eval_figures renders the PCA/t-SNE conditioning projection
    (reference parity: expertsim/train/loop.py:258-329) and saves it."""
    import os

    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from zdcsim.train.eval_plots import generate_eval_figures, save_figures

    cfg, modules, state = setup
    n = 64
    test_arrays = {
        "real": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n, *SHAPE, 1))),
        "cond": jax.random.normal(jax.random.PRNGKey(2), (n, 9)),
    }
    figs = generate_eval_figures(
        modules, state, test_arrays, epoch=3,
        cond_names=[f"c{i}" for i in range(9)], key=jax.random.PRNGKey(7),
    )
    assert "cond_pca_tsne" in figs
    save_figures(figs, str(tmp_path / "plots"), 3)
    assert os.path.exists(str(tmp_path / "plots" / "cond_pca_tsne_epoch_3.png"))
