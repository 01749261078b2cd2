"""Shared utilities: PRNG discipline, experiment IO, logging setup."""

from zdcsim.utils.prng import key_iterator, fold_epoch_batch  # noqa: F401
from zdcsim.utils.io import (  # noqa: F401
    DIR_INFO,
    DIR_MODELS,
    create_dir,
    save_scales,
    load_scales,
    save_train_test_indices,
    load_train_test_indices,
    append_experiment_dir_to_cfg,
)
