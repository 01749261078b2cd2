"""Per-evaluation diagnostic figure generation.

The analog of the reference's eval-time plotting block
(expertsim/train/loop.py:234-329): routed sample grids, per-expert photon-sum
histograms, and expert-specialization panels, produced every eval epoch when
``wandb.plot_images`` or ``train.save_eval_plots`` is enabled.
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from zdcsim.evals.plots import (
    plot_cond_pca_tsne,
    plot_expert_heatmap,
    plot_expert_specialization,
    plot_photonsum_histograms_shared,
    plot_real_vs_generated,
)

log = logging.getLogger(__name__)


def generate_eval_figures(
    modules,
    state,
    test_arrays: Dict[str, jnp.ndarray],
    epoch: int,
    cond_names,
    key: jax.Array,
    max_samples: int = 512,
) -> Dict[str, "object"]:
    """Route + generate a sample of the test set and build the figures."""
    cond = test_arrays["cond"][:max_samples]
    real = test_arrays["real"][:max_samples]
    n = cond.shape[0]

    _, logits = modules.router.apply({"params": state.router.params}, cond)
    idx = jnp.argmax(logits, axis=-1)
    noise = jax.random.normal(key, (n, modules.noise_dim))
    variables = {"params": state.gen.params, **state.gen.stats}
    mutable = list(state.gen.stats.keys())
    if mutable:
        imgs, _ = modules.generator.apply(variables, noise, cond, False, mutable=mutable)
    else:
        imgs = modules.generator.apply(variables, noise, cond, False)
    gen = jnp.take_along_axis(imgs, idx[None, :, None, None, None], axis=0)[0, ..., 0]
    gen_lin = np.asarray(jnp.expm1(gen))
    real_lin = np.asarray(jnp.expm1(real[..., 0] if real.ndim == 4 else real))
    idx_np = np.asarray(idx)
    cond_np = np.asarray(cond)

    figures = {
        "real_vs_generated": plot_real_vs_generated(
            real_lin, gen_lin, epoch, title=modules.names.get("generator", "")
        ),
        "photonsum_histograms": plot_photonsum_histograms_shared(
            [gen_lin[idx_np == e].reshape(max(1, (idx_np == e).sum()), -1).sum(axis=1)
             for e in range(modules.n_experts) if (idx_np == e).any()]
            + [real_lin.reshape(n, -1).sum(axis=1)],
            labels=[f"Expert {e}" for e in range(modules.n_experts) if (idx_np == e).any()]
            + ["GEANT4"],
        ),
        "expert_specialization": plot_expert_specialization(cond_np, idx_np, epoch, cond_names),
        "expert_heatmap": plot_expert_heatmap(cond_np, idx_np, epoch, cond_names),
    }
    # PCA/t-SNE of the conditioning set colored by routed expert — rendered
    # during eval like the reference (expertsim/train/loop.py:258-329).
    # t-SNE needs >1 routed expert and a handful of samples to be meaningful.
    if len(np.unique(idx_np)) > 1 and n >= 16:
        try:
            figures["cond_pca_tsne"] = plot_cond_pca_tsne(cond_np, idx_np, epoch)
        except Exception:
            log.warning("PCA/t-SNE figure failed", exc_info=True)
    return figures


def save_figures(figures: Dict[str, "object"], out_dir: str, epoch: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, fig in figures.items():
        path = os.path.join(out_dir, f"{name}_epoch_{epoch}.png")
        fig.savefig(path, dpi=110)
    log.info("Saved %d eval figures to %s", len(figures), out_dir)
