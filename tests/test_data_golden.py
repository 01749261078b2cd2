"""Golden ingestion test for the REAL pickle format (no dataset.synthetic).

Locks the reference training-pickle contract — float64 DataFrame columns
including ``std_proton``/``group_number_proton``/``expert_number``, a pickled
log-space image array, and a max_x/max_y coordinate frame
(expertsim/utils/data_transformations.py:23-257) — through the full zdcsim
pipeline ``_load_pickles -> get_dataset -> transform_data_for_training``
against committed golden outputs, so day-one real-data ingestion cannot
break silently. Regenerate with ``python tests/fixtures/make_real_pickles.py``
after an INTENTIONAL pipeline change.
"""

import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

from zdcsim.config import load_config
from zdcsim.data.dataset import get_dataset, transform_data_for_training

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "real_pickles")


def fixture_cfg(**over):
    base = [
        f"dataset.DATA_IMAGES_PATH={os.path.join(FIX, 'data_proton_fixture.pkl')}",
        f"dataset.DATA_COND_PATH={os.path.join(FIX, 'data_cond_fixture.pkl')}",
        f"dataset.DATA_POSITIONS_PATH={os.path.join(FIX, 'data_coord_fixture.pkl')}",
        "train.save_experiment_data=false",
        "train.seed=7",
    ]
    return load_config(overrides=base + [f"{k}={v}" for k, v in over.items()])


def test_real_pickle_golden_roundtrip():
    cfg = fixture_cfg()
    exp = np.load(os.path.join(FIX, "expected.npz"))
    ds = get_dataset(cfg)
    # photon-sum filter (MIN_INTENSITY_THRESHOLD=1) drops the 2 empty events
    assert ds.n_events == int(exp["n_events"]) == 22
    assert cfg.photon_sum_min == pytest.approx(float(exp["photon_sum_min"]))
    assert cfg.photon_sum_max == pytest.approx(float(exp["photon_sum_max"]))

    split = transform_data_for_training(cfg, ds)
    for key in (
        "x_train", "x_test", "y_train", "y_test", "std_train", "std_test",
        "intensity_train", "intensity_test", "positions_train", "positions_test",
        "expert_number_train", "expert_number_test",
        "train_indices", "test_indices",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(split, key)), exp[key], rtol=1e-6, atol=1e-6,
            err_msg=f"real-pickle golden mismatch in {key}",
        )
    np.testing.assert_allclose(split.scaler_cond.mean_, exp["scaler_cond_mean"], rtol=1e-6)
    np.testing.assert_allclose(split.scaler_cond.scale_, exp["scaler_cond_scale"], rtol=1e-6)


def test_real_pickle_semantics():
    """Structural invariants of the ingestion, independent of the golden file."""
    cfg = fixture_cfg()
    ds = get_dataset(cfg)
    split = transform_data_for_training(cfg, ds)
    n = split.x_train.shape[0] + split.x_test.shape[0]
    assert n == 22
    assert split.x_train.shape[1:] == (56, 30)
    # conditioning standardized over the full set
    all_cond = np.concatenate([split.y_train, split.y_test])
    np.testing.assert_allclose(all_cond.mean(axis=0), 0.0, atol=1e-4)
    # diversity std MinMax-scaled into [0, 1]
    all_std = np.concatenate([split.std_train, split.std_test])
    assert all_std.min() >= 0.0 and all_std.max() <= 1.0 + 1e-6
    # intensity = the raw linear photon sum column, positions unscaled ints
    assert np.concatenate([split.intensity_train, split.intensity_test]).min() >= 1.0
    pos = np.concatenate([split.positions_train, split.positions_test])
    assert pos.min() >= 0 and pos[:, 0].max() <= 55 and pos[:, 1].max() <= 29
    # expert_number column carried through for router-classification eval
    exp_all = np.concatenate([split.expert_number_train, split.expert_number_test])
    assert set(np.unique(exp_all)) <= {0, 1, 2}


def test_real_pickle_limit_samples():
    """cfg.limit_samples slices all three pickles coherently (the reference
    resolves the absent key to None only because hydra struct mode is off —
    zdcsim declares it, data_transformations.py:28)."""
    cfg = fixture_cfg(limit_samples=10)
    ds = get_dataset(cfg)
    assert ds.n_events <= 10
    split = transform_data_for_training(cfg, ds)
    assert split.x_train.shape[0] + split.x_test.shape[0] == ds.n_events
