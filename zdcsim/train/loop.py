"""Training orchestration: the epoch loop.

Analog of the reference ``train()`` / ``train_epoch()`` / ``evaluate_epoch()``
(expertsim/train/loop.py:27-255), with the per-batch GAN logic compiled into
one jitted step (zdcsim.train.step). Metric accumulation stays on device for
the whole epoch (one host sync per epoch; the reference converts every batch's
~16 tensors to Python scalars, loop.py:138-142).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.data import get_train_test_data, make_loaders
from zdcsim.models import build_moe
from zdcsim.train.evaluate import build_evaluator
from zdcsim.train.hooks import setup_callbacks
from zdcsim.train.state import init_state_jit
from zdcsim.train.step import build_train_step
from zdcsim.utils.io import append_experiment_dir_to_cfg
from zdcsim.utils.prng import fold_epoch_batch
from zdcsim.utils.profiling import trace

log = logging.getLogger(__name__)


def _accumulate(acc, new):
    if acc is None:
        return new
    return jax.tree_util.tree_map(jnp.add, acc, new)


def _finalize_metrics(acc, n_batches: int) -> Dict[str, Any]:
    """Device sums -> host floats; per-expert vectors expand to ``_i`` keys
    matching the reference's wandb names (moe.py:480-504)."""
    means = jax.tree_util.tree_map(lambda x: np.asarray(x) / n_batches, acc)
    out: Dict[str, Any] = {}
    for k, v in means.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = float(v)
        else:
            base = k[: -len("_experts")] if k.endswith("_experts") else k
            for i, x in enumerate(v):
                out[f"{base}_{i}"] = float(x)
    return out


def train(
    cfg, split=None, sharding=None, modules=None, return_state: bool = False
) -> List[Dict[str, Any]]:
    """Full training run; returns the per-epoch metric history
    (reference ``train()``, train/loop.py:27-94). ``modules`` overrides the
    model bundle (tests inject tiny stand-ins). With ``return_state`` the
    final train state is returned too — ``(history, state)`` — so studies
    can evaluate EMA-vs-raw weights without a checkpoint round trip."""
    if "experiment_dir" not in cfg.config:
        append_experiment_dir_to_cfg(cfg)
    if split is None:
        split = get_train_test_data(cfg)

    if modules is None:
        modules = build_moe(cfg)
    key = jax.random.PRNGKey(int(cfg.train.seed))
    key, k_init = jax.random.split(key)
    state = init_state_jit(modules, cfg, k_init)

    # Multi-device: build the (data, expert) mesh from cfg.parallel and
    # compile the step as one GSPMD program (new capability vs the
    # single-device reference, SURVEY.md §2.7).
    mesh = None
    n_dev = cfg.parallel.get("n_devices") or len(jax.devices())
    if n_dev > 1 and sharding is None:
        from zdcsim.parallel.mesh import batch_sharding, make_mesh, shard_state

        ep = int(cfg.parallel.get("expert_parallel", 1))
        if modules.n_experts % max(ep, 1) != 0:
            raise ValueError(
                f"parallel.expert_parallel={ep} must divide model.n_experts={modules.n_experts}"
            )
        if int(cfg.train.batch_size) % (int(n_dev) // max(ep, 1)) != 0:
            raise ValueError(
                f"train.batch_size={cfg.train.batch_size} must be divisible by the "
                f"data-parallel degree {int(n_dev) // max(ep, 1)}"
            )
        mesh = make_mesh(n_devices=int(n_dev), expert_parallel=ep)
        state = shard_state(mesh, state, modules.n_experts)
        sharding = batch_sharding(mesh)
        log.info("Mesh: %s", dict(zip(mesh.axis_names, mesh.devices.shape)))

    start_epoch = 0
    if cfg.train.checkpoint_experiment_dir is not None and cfg.train.epoch_to_load is not None:
        from zdcsim.train.checkpoint import restore_checkpoint
        from zdcsim.utils.io import DIR_MODELS

        ckpt_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=cfg.train.checkpoint_experiment_dir)
        state = restore_checkpoint(ckpt_models, int(cfg.train.epoch_to_load), state)
        start_epoch = int(cfg.train.epoch_to_load)
        log.info("Resumed from %s epoch %d", ckpt_models, start_epoch)

    train_loader, test_loader = make_loaders(cfg, split, sharding=sharding)
    train_step = build_train_step(modules, cfg, mesh=mesh, example_state=state if mesh else None)
    evaluator = build_evaluator(modules, cfg)
    callbacks = setup_callbacks(cfg, split.dir_models)
    eval_every = int(cfg.train.get("eval_every", 1))

    from zdcsim.models import model_info

    log.info("\n%s", model_info(modules, state))
    callbacks.on_train_start(cfg, state)
    history: List[Dict[str, Any]] = []
    epochs = int(cfg.train.epochs)
    profile_epoch = cfg.train.get("profile_epoch")
    profile_dir = cfg.train.get("profile_dir") or os.path.join(
        str(cfg.config.experiment_dir), "traces"
    )
    plot_images = bool(cfg.wandb.get("plot_images", False)) or bool(
        cfg.train.get("save_eval_plots", False)
    )
    try:
        for epoch in range(start_epoch, epochs):
            callbacks.on_epoch_start(epoch)
            t0 = time.time()
            acc = None
            n_batches = 0
            with trace(profile_dir if profile_epoch == epoch else None):
                for b, batch in enumerate(train_loader.epoch(epoch)):
                    step_key = fold_epoch_batch(key, epoch, b)
                    state, metrics = train_step(state, batch, step_key, jnp.asarray(epoch))
                    acc = _accumulate(acc, metrics)
                    n_batches += 1
            epoch_metrics = _finalize_metrics(acc, n_batches)
            epoch_metrics["epoch_time"] = time.time() - t0

            if eval_every and (epoch % eval_every == 0 or epoch == epochs - 1):
                eval_key = jax.random.fold_in(key, 10_000_000 + epoch)
                ws = evaluator(
                    state, test_loader.arrays, epoch, eval_key,
                    expert_labels=split.expert_number_test,
                )
                epoch_metrics["ws_mean"] = ws["ws_mean"]
                epoch_metrics["ws_std"] = ws["ws_std"]
                for i in range(modules.n_experts):
                    epoch_metrics[f"ws_mean_{i}"] = float(ws["ws_mean_exp"][i])
                    epoch_metrics[f"ws_std_{i}"] = float(ws["ws_std_exp"][i])
                for k in ("router_accuracy", "router_precision", "router_recall", "router_f1"):
                    if k in ws:
                        epoch_metrics[k] = ws[k]
                if plot_images:
                    from zdcsim.train.eval_plots import generate_eval_figures, save_figures

                    try:
                        figs = generate_eval_figures(
                            modules, state, test_loader.arrays, epoch,
                            cfg.get("data_cond_names") or [f"c{i}" for i in range(9)],
                            jax.random.fold_in(key, 20_000_000 + epoch),
                        )
                        save_figures(
                            figs, os.path.join(str(cfg.config.experiment_dir), "plots"), epoch
                        )
                        epoch_metrics["_figures"] = figs
                    except Exception:
                        log.warning("Eval figure generation failed", exc_info=True)

            history.append(
                {"epoch": epoch, **{k: v for k, v in epoch_metrics.items() if not k.startswith("_")}}
            )
            callbacks.on_epoch_end(epoch, epoch_metrics, state)
    except Exception:
        log.exception("Training failed at epoch loop")
        raise
    finally:
        callbacks.on_train_end(history)
    if return_state:
        return history, state
    return history
