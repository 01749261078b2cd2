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


def test_train_resume_roundtrip(tmp_path, monkeypatch):
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

    # --eval/--simulate with --checkpoint-epoch must reuse the persisted
    # split: the CLI maps the flag onto train.epoch_to_load so
    # get_train_test_data loads the saved indices instead of regenerating
    # from the seed (no train/test leakage).
    from zdcsim.cli import _inject_checkpoint_epoch

    overrides = _inject_checkpoint_epoch(
        [f"train.checkpoint_experiment_dir={exp_dir}"], 2
    )
    assert "train.epoch_to_load=2" in overrides
    cfg3 = _cfg(tmp_path, **{
        "train.checkpoint_experiment_dir": exp_dir, "train.epoch_to_load": 2,
    })
    import zdcsim.data.dataset as dsmod
    from zdcsim.data import get_train_test_data

    loaded_paths = []
    orig_load = dsmod.load_train_test_indices

    def spy(path):
        loaded_paths.append(path)
        return orig_load(path)

    monkeypatch.setattr(dsmod, "load_train_test_indices", spy)
    split_resumed = get_train_test_data(cfg3)
    assert loaded_paths, "resume eval must load the PERSISTED split indices"
    # same seed/data: persisted membership equals the training run's split
    split_train = get_train_test_data(_cfg(tmp_path))
    np.testing.assert_array_equal(split_resumed.y_test, split_train.y_test)
    # without --checkpoint-epoch the overrides pass through untouched
    assert _inject_checkpoint_epoch(["a=1"], None) == ["a=1"]
    # an explicit user epoch_to_load wins
    assert _inject_checkpoint_epoch(["train.epoch_to_load=9"], 2) == ["train.epoch_to_load=9"]
