"""Serving-time distillation mechanics (zdcsim/inference/distill.py) on tiny
stand-in modules — the production use (proton width-scaled student) runs on
chip via experiments/distill_r4.py with fidelity.py as the gate."""

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.config import load_config
from zdcsim.inference.distill import distill_generator
from zdcsim.models.testing import build_tiny_moe
from zdcsim.train.state import init_state

SHAPE = (8, 6)


def test_distill_converges_toward_teacher():
    cfg = load_config(overrides=[
        "model.n_experts=3", "train.batch_size=16",
        f"dataset.input_image_shape=[{SHAPE[0]}, {SHAPE[1]}]",
    ])
    modules = build_tiny_moe(cfg, SHAPE)
    t_state = init_state(modules, cfg, jax.random.PRNGKey(0))
    teacher_params = t_state.gen.params
    router_params = t_state.router.params

    def teacher_apply(noise, cond):
        return modules.generator.apply({"params": teacher_params}, noise, cond, False)

    def router_apply(cond):
        _, logits = modules.router.apply({"params": router_params}, cond)
        return jnp.argmax(logits, axis=-1)

    # student: same tiny architecture, independent init (seed 9)
    s_state = init_state(modules, cfg, jax.random.PRNGKey(9))
    student_params0 = s_state.gen.params

    cond_pool = np.random.default_rng(3).normal(size=(256, 9)).astype(np.float32)
    noise_dim = modules.noise_dim

    def eval_gap(params):
        z = jax.random.normal(jax.random.PRNGKey(77), (64, noise_dim))
        c = jnp.asarray(cond_pool[:64])
        t = teacher_apply(z, c)
        s = modules.generator.apply({"params": params}, z, c, False)
        return float(jnp.mean((s - t) ** 2))

    gap0 = eval_gap(student_params0)
    params, metrics = distill_generator(
        modules.generator, student_params0, teacher_apply, router_apply,
        cond_pool, jax.random.PRNGKey(1), noise_dim,
        steps=600, batch_size=32, lr=3e-3, inner_steps=25,
    )
    gap1 = eval_gap(params)
    assert np.isfinite(metrics["loss"])
    assert gap1 < gap0 / 5, f"distillation did not converge: {gap0} -> {gap1}"
