"""End-to-end learning test: the full training loop (tiny models, synthetic
data) must improve the Wasserstein fidelity metric — the SURVEY §4 synthetic
integration test."""

import numpy as np
import pytest

from zdcsim.config import load_config
from zdcsim.models.testing import build_tiny_moe
from zdcsim.train.loop import train

SHAPE = (8, 6)


@pytest.mark.slow
def test_training_improves_ws(tmp_path):
    cfg = load_config(overrides=[
        "dataset.synthetic=true",
        "dataset.synthetic_n_samples=512",
        "dataset.input_image_shape=[8, 6]",
        "train.batch_size=64",
        "train.epochs=40",
        "train.eval_every=10",
        "model.n_experts=2",
        # tiny-model recipe: outputs must grow ~e^9 from init, so the test
        # uses hotter lrs and a stronger intensity pull than production
        "model.generator.lr_g=2e-3",
        "model.discriminator.lr_d=5e-4",
        "model.generator.in_strength=1e-2",
        f"train.save_experiments_dir={tmp_path}/",
    ])
    modules = build_tiny_moe(cfg, SHAPE)
    history = train(cfg, modules=modules)
    assert len(history) == 40
    ws = [h["ws_mean"] for h in history if "ws_mean" in h]
    assert len(ws) >= 2
    # training must improve fidelity materially from the random init
    assert ws[-1] < 0.7 * ws[0], f"ws did not improve: {ws}"
    # and never NaN
    assert all(np.isfinite(h["gen_loss"]) for h in history)


def test_training_curves_saved(tmp_path):
    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=128",
        "dataset.input_image_shape=[8, 6]", "train.batch_size=32",
        "train.epochs=3", "train.eval_every=2", "model.n_experts=2",
        "train.save_eval_plots=true", "parallel.n_devices=1",
        f"train.save_experiments_dir={tmp_path}/",
    ])
    modules = build_tiny_moe(cfg, SHAPE)
    train(cfg, modules=modules)
    import os

    assert os.path.exists(os.path.join(cfg.config.experiment_dir, "plots", "training_curves.png"))
