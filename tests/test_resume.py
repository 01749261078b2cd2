"""End-to-end checkpoint/resume through the training loop (the capability the
reference left unwired — SURVEY.md §3.5)."""

import jax
import numpy as np

from zdcsim.config import load_config
from zdcsim.models.testing import build_tiny_moe
from zdcsim.train.loop import train

SHAPE = (8, 6)


def _cfg(tmp_path, **over):
    base = [
        "dataset.synthetic=true", "dataset.synthetic_n_samples=128",
        "dataset.input_image_shape=[8, 6]", "train.batch_size=32",
        "model.n_experts=2", "train.eval_every=1",
        "train.ws_threshold_model_save=1e18",  # save at every eval
        "train.save_experiment_data=true",
        f"train.save_experiments_dir={tmp_path}/",
        "parallel.n_devices=1",  # keep the test single-device
    ]
    return load_config(overrides=base + [f"{k}={v}" for k, v in over.items()])


def test_train_resume_roundtrip(tmp_path):
    cfg = _cfg(tmp_path, **{"train.epochs": 3, "config.run_name": "first"})
    modules = build_tiny_moe(cfg, SHAPE)
    history = train(cfg, modules=modules)
    assert len(history) == 3
    exp_dir = cfg.config.experiment_dir  # timestamped dir under tmp_path

    cfg2 = _cfg(
        tmp_path,
        **{
            "train.epochs": 5,
            "config.run_name": "resumed",
            "train.checkpoint_experiment_dir": exp_dir,
            "train.epoch_to_load": 2,
        },
    )
    modules2 = build_tiny_moe(cfg2, SHAPE)
    history2 = train(cfg2, modules=modules2)
    # resumed from epoch 2: trains epochs 2..4
    assert [h["epoch"] for h in history2] == [2, 3, 4]
    assert np.isfinite(history2[-1]["gen_loss"])
