"""Experiment IO and PRNG utility tests."""

import jax
import numpy as np

from zdcsim.config import load_config
from zdcsim.utils.io import (
    append_experiment_dir_to_cfg,
    load_scales,
    load_train_test_indices,
    save_scales,
    save_train_test_indices,
)
from zdcsim.utils.prng import fold_epoch_batch, key_iterator, split_tree


def test_scales_roundtrip(tmp_path):
    means = np.array([1.5, -2.0, 0.0], np.float32)
    scales = np.array([0.5, 3.0, 1.0], np.float32)
    save_scales("proton", means, scales, str(tmp_path))
    m, s = load_scales("proton", str(tmp_path))
    np.testing.assert_allclose(m, means)
    np.testing.assert_allclose(s, scales)


def test_indices_roundtrip(tmp_path):
    tr, te = np.arange(10), np.arange(10, 14)
    save_train_test_indices(str(tmp_path), tr, te)
    tr2, te2 = load_train_test_indices(str(tmp_path))
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(te, te2)


def test_experiment_dir_naming():
    cfg = load_config()
    append_experiment_dir_to_cfg(cfg)
    assert cfg.config.run_name in cfg.config.experiment_dir
    assert cfg.config.experiment_dir.startswith(cfg.train.save_experiments_dir)
    assert cfg.wandb.run_name.startswith(cfg.config.run_name)


def test_prng_determinism():
    key = jax.random.PRNGKey(0)
    a = fold_epoch_batch(key, 3, 7)
    b = fold_epoch_batch(key, 3, 7)
    c = fold_epoch_batch(key, 3, 8)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    it = key_iterator(0)
    k1, k2 = next(it), next(it)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    ks = split_tree(key, 4)
    assert len(ks) == 4
