"""Evaluation extras: diagnostic plots, image statistics, router metrics.

Capability parity with the reference's plotting/eval helpers
(expertsim/train/utils.py:313-620, expertsim/utils/utils_eval.py) re-written
for the zdcsim data flow (numpy arrays in, matplotlib figures out).
"""

from zdcsim.evals.stats import image_feature_stats  # noqa: F401
from zdcsim.evals.router_metrics import router_classification_metrics  # noqa: F401
from zdcsim.evals.plots import (  # noqa: F401
    plot_cond_pca_tsne,
    plot_expert_heatmap,
    plot_expert_specialization,
    plot_photonsum_histograms_shared,
    plot_real_vs_generated,
)
