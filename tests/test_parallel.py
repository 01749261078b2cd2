"""Multi-chip sharding tests on the 8-device virtual CPU mesh (tiny models).

Validates: mesh construction, state sharding rules (expert axis on stacked
leaves, replicated router), and a full GSPMD train step over (data x expert)
— the same path __graft_entry__.dryrun_multichip exercises with real models.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zdcsim.config import load_config
from zdcsim.models.testing import build_tiny_moe
from zdcsim.parallel.mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    batch_sharding,
    make_mesh,
    shard_state,
    state_shardings,
)
from zdcsim.train.state import init_state
from zdcsim.train.step import build_train_step

SHAPE = (8, 6)


def tiny_cfg(n_experts=4):
    return load_config(overrides=[
        f"model.n_experts={n_experts}", "train.batch_size=16",
        f"dataset.input_image_shape=[{SHAPE[0]}, {SHAPE[1]}]",
    ])


def test_make_mesh_shapes(cpu_devices):
    mesh = make_mesh(n_devices=8, expert_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == (DATA_AXIS, EXPERT_AXIS)
    with pytest.raises(ValueError):
        make_mesh(n_devices=8, expert_parallel=3)


def test_state_sharding_rules(cpu_devices):
    cfg = tiny_cfg(n_experts=4)
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_devices=8, expert_parallel=2)
    shardings = state_shardings(mesh, state, 4)
    # expert-stacked generator leaf shards over expert axis
    gen_leaf_sharding = jax.tree_util.tree_leaves(shardings.gen.params)[0]
    assert EXPERT_AXIS in str(gen_leaf_sharding.spec)
    # router replicates — including its (E,)-shaped logit-head bias, which a
    # shape[0]==E heuristic would wrongly expert-shard (structural-rule guard)
    router_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s, shardings.router)
    )
    e_sized = [
        s for s, leaf in zip(
            jax.tree_util.tree_leaves(shardings.router.params),
            jax.tree_util.tree_leaves(state.router.params),
        )
        if getattr(leaf, "shape", ()) and leaf.shape[0] == 4
    ]
    assert e_sized, "expected at least one (E,)-leading router leaf (logit bias)"
    for s in router_leaves:
        assert s.spec == jax.sharding.PartitionSpec()
    # EMA shadow weights shard like the generator; the step counter replicates
    ema_leaf = jax.tree_util.tree_leaves(shardings.ema_gen_params)[0]
    assert EXPERT_AXIS in str(ema_leaf.spec)
    assert shardings.step.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_executes(cpu_devices):
    cfg = tiny_cfg(n_experts=4)
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_devices=8, expert_parallel=2)
    state = shard_state(mesh, state, 4)
    bsh = batch_sharding(mesh)
    B = 16
    key = jax.random.PRNGKey(1)
    mk = lambda i, shape: jax.device_put(
        jnp.abs(jax.random.normal(jax.random.fold_in(key, i), shape)), bsh
    )
    batch = {
        "real": mk(0, (B, *SHAPE, 1)),
        "cond": mk(1, (B, 9)),
        "std": mk(2, (B, 1)),
        "intensity": mk(3, (B, 1)),
        "positions": mk(4, (B, 2)),
    }
    step = build_train_step(modules, cfg, mesh=mesh, example_state=state)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isclose(float(jnp.sum(metrics["n_choosen_experts_mean_epoch"])), 1.0)
    # sharded result matches the single-device step numerically
    modules2 = build_tiny_moe(cfg, SHAPE)
    state2 = init_state(modules2, cfg, jax.random.PRNGKey(0))
    step2 = build_train_step(modules2, cfg)
    batch_local = {k: jnp.asarray(v) for k, v in batch.items()}
    _, metrics2 = step2(state2, batch_local, jax.random.PRNGKey(2), jnp.asarray(0))
    np.testing.assert_allclose(
        float(metrics["gen_loss"]), float(metrics2["gen_loss"]), rtol=1e-4
    )


def test_data_parallel_only_mesh(cpu_devices):
    cfg = tiny_cfg(n_experts=3)
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_devices=8, expert_parallel=1)
    assert mesh.devices.shape == (8, 1)
    state = shard_state(mesh, state, 3)
    step = build_train_step(modules, cfg, mesh=mesh, example_state=state)
    B = 16
    bsh = batch_sharding(mesh)
    batch = {
        "real": jax.device_put(jnp.ones((B, *SHAPE, 1)), bsh),
        "cond": jax.device_put(jnp.zeros((B, 9)), bsh),
        "std": jax.device_put(jnp.ones((B, 1)) * 0.5, bsh),
        "intensity": jax.device_put(jnp.ones((B, 1)) * 10, bsh),
        "positions": jax.device_put(jnp.ones((B, 2)), bsh),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(metrics["disc_loss"]))


def test_sharded_switch_serving_matches_single_device(cpu_devices):
    """Multi-chip serving: tiled-switch dispatch sharded over the data axis
    (shard_map, weights replicated) must reproduce the single-device switch
    outputs exactly — same key -> same noise; dispatch is per-sample."""
    from zdcsim.inference import FastSim

    cfg = tiny_cfg(n_experts=3)
    modules = build_tiny_moe(cfg, SHAPE)
    state = init_state(modules, cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(n_devices=8, expert_parallel=1)
    engine_sharded = FastSim.from_state(modules, state, batch_size=128, mesh=mesh)
    engine_local = FastSim.from_state(modules, state, batch_size=128)
    cond = np.random.default_rng(7).normal(size=(200, 9)).astype(np.float32)
    key = jax.random.PRNGKey(11)
    out_s, idx_s = engine_sharded.simulate_switch(cond, key, return_experts=True)
    out_l, idx_l = engine_local.simulate_switch(cond, key, return_experts=True)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_l))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_l), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("expert_parallel", [1, 2])
def test_sharded_switch_train_step_matches_dense(cpu_devices, expert_parallel):
    """train.dispatch=switch under the mesh (VERDICT r3 #4): the tiled-switch
    train dispatch runs per-device inside shard_map — batch sharded over the
    data axis, and over the expert axis too when expert_parallel>1 (extra
    data parallelism for the dispatch; expert-sharded params all-gather at
    the boundary — VERDICT r4 #5) — and must reproduce the dense SHARDED
    step's losses and parameter updates. Constant router GAN term on both
    sides (the one documented semantic difference between dense and switch);
    tiny models are dropout/stats-free, so results differ only by fp
    reduction order."""
    # E must divide over the expert axis when expert_parallel=2
    n_experts = 3 if expert_parallel == 1 else 4
    ov = dict(**{
        "model.n_experts": n_experts, "train.batch_size": 16,
        "dataset.input_image_shape": f"[{SHAPE[0]}, {SHAPE[1]}]",
        "model.router.differentiable_gan_term": "false",
    })
    cfg_d = load_config(overrides=[f"{k}={v}" for k, v in ov.items()])
    cfg_s = load_config(overrides=[
        *[f"{k}={v}" for k, v in ov.items()],
        "train.dispatch=switch", "train.dispatch_tile=4",
    ])
    modules = build_tiny_moe(cfg_d, SHAPE)
    state = init_state(modules, cfg_d, jax.random.PRNGKey(0))
    mesh = make_mesh(n_devices=8, expert_parallel=expert_parallel)
    bsh = batch_sharding(mesh)
    B = 16
    key = jax.random.PRNGKey(1)
    mk = lambda i, shape: jax.device_put(
        jnp.abs(jax.random.normal(jax.random.fold_in(key, i), shape)), bsh
    )
    batch = {
        "real": mk(0, (B, *SHAPE, 1)),
        "cond": mk(1, (B, 9)),
        "std": mk(2, (B, 1)),
        "intensity": mk(3, (B, 1)),
        "positions": mk(4, (B, 2)),
    }
    # deep-copy per arm: both steps donate their input state, and device_put
    # reuses buffers, so sharding the same host state twice would alias
    fresh = lambda s: jax.tree_util.tree_map(jnp.copy, s)
    sd_state = shard_state(mesh, fresh(state), n_experts)
    ss_state = shard_state(mesh, fresh(state), n_experts)
    step_d = build_train_step(modules, cfg_d, mesh=mesh, example_state=sd_state)
    step_s = build_train_step(modules, cfg_s, mesh=mesh, example_state=ss_state)
    k = jax.random.PRNGKey(2)
    sd, md = step_d(sd_state, batch, k, jnp.asarray(0))
    ss, ms = step_s(ss_state, batch, k, jnp.asarray(0))
    for name in ("gen_loss", "disc_loss", "div_loss", "intensity_loss",
                 "aux_reg_loss", "router_loss", "gan_loss"):
        np.testing.assert_allclose(
            np.asarray(md[name]), np.asarray(ms[name]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {name} dense-mesh vs switch-mesh",
        )
    # Adam's first step is ~lr*sign(g) (m/(sqrt(v)+eps) with one sample), so
    # elements whose gradient is fp-noise around zero can land at +/-lr in
    # either arm — sharded-switch vs sharded-dense differ in reduction order
    # (per-device partials + psum). Bound per-element drift by 2*lr+slack
    # rather than a relative check that a benign sign flip at |g|~0 fails.
    lr = 1e-4
    for comp, cd, cs in (("gen", sd.gen, ss.gen), ("disc", sd.disc, ss.disc),
                         ("aux", sd.aux, ss.aux), ("router", sd.router, ss.router)):
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(cd.params),
            jax.tree_util.tree_leaves_with_path(cs.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2 * lr + 1e-5,
                err_msg=f"{comp} params {pa} dense-mesh vs switch-mesh",
            )


@pytest.mark.slow
def test_real_arch_multichip_dryrun():
    """One REAL proton-56x30 GSPMD train step + sharded-switch serve on the
    8-device virtual mesh (VERDICT r3 #5): the real conv shapes partitioned
    and executed under (data x expert) sharding at least once per round.
    Slow-marked: minutes of XLA compile on this 1-core host.

    Runs in a SUBPROCESS: the full-size programs need a clean address
    space — inside a long pytest process (hundreds of compiled programs
    resident) the serve's block_until_ready aborts under host-memory
    pressure (observed SIGABRT when run after the full suite)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8, real_arch=True)"],
        cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"real-arch dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout


def test_train_loop_multi_device(cpu_devices, tmp_path):
    """Full train() on the 8-device virtual mesh (auto mesh from cfg.parallel)."""
    from zdcsim.train.loop import train

    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=128",
        "dataset.input_image_shape=[8, 6]", "train.batch_size=32",
        "train.epochs=2", "train.eval_every=1", "model.n_experts=4",
        "parallel.n_devices=8", "parallel.expert_parallel=2",
        f"train.save_experiments_dir={tmp_path}/",
    ])
    modules = build_tiny_moe(cfg, SHAPE)
    history = train(cfg, modules=modules)
    assert len(history) == 2
    assert np.isfinite(history[-1]["gen_loss"])
    assert "ws_mean" in history[-1]
