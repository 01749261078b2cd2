"""Generate the committed real-pickle format fixture.

Reproduces the REFERENCE's training-pickle layout exactly
(expertsim/utils/data_transformations.py:23-129 reads them):

- ``data_proton_*.pkl``   — pickled numpy array of LOG-space images [N, 56, 30]
- ``data_cond_*.pkl``     — pandas DataFrame, float64 columns: the 9 kinematic
  conditioning columns (Energy..charge), ``proton_photon_sum``,
  ``std_proton``, ``group_number_proton``, ``expert_number``
- ``data_coord_*.pkl``    — pandas DataFrame, float64 ``max_x``/``max_y``

Run from the repo root to (re)generate both the pickles and the golden
``expected.npz`` (the transform outputs of the CURRENT pipeline — committed
so that any future ingestion change that silently alters them fails
tests/test_data_golden.py).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "real_pickles")
N, H, W = 24, 56, 30
N_GROUPS = 10


def main() -> None:
    rng = np.random.default_rng(20260817)
    os.makedirs(HERE, exist_ok=True)

    # groups of identical conditioning rows (the SDI-GAN same-cond pairing
    # structure, reference data_transformations.py:147-158)
    group_of = np.sort(rng.integers(0, N_GROUPS, size=N))
    base_cond = rng.normal(size=(N_GROUPS, 9)) * [500, 1, 1, 2, 3, 3, 800, 1, 1]
    cond9 = base_cond[group_of]

    # linear-space showers; two events made near-empty so the default
    # MIN_INTENSITY_THRESHOLD=1 filter drops them
    linear = rng.gamma(0.12, 18.0, size=(N, H, W)) * (
        rng.random((N, H, W)) < 0.08
    )
    linear[0] = 0.0
    linear[13] = 0.0
    images_log = np.log1p(linear).astype(np.float32)

    photon_sum = linear.reshape(N, -1).sum(axis=1)
    # per-group diversity std of the log images, max-normalized (the
    # calculating_diversity notebook's product)
    std_raw = np.zeros(N)
    for g in range(N_GROUPS):
        m = group_of == g
        if m.sum() > 1:
            std_raw[m] = images_log[m].std(axis=0).sum()
    std_col = std_raw / max(std_raw.max(), 1e-9)

    flat_idx = images_log.reshape(N, -1).argmax(axis=1)
    max_x, max_y = np.unravel_index(flat_idx, (H, W))

    cond_df = pd.DataFrame(
        {
            "Energy": cond9[:, 0], "Vx": cond9[:, 1], "Vy": cond9[:, 2],
            "Vz": cond9[:, 3], "Px": cond9[:, 4], "Py": cond9[:, 5],
            "Pz": cond9[:, 6], "mass": cond9[:, 7], "charge": cond9[:, 8],
            "proton_photon_sum": photon_sum,
            "std_proton": std_col,
            "group_number_proton": group_of.astype(np.float64),
            "expert_number": (group_of % 3).astype(np.float64),
        },
        dtype=np.float64,
    )
    posi_df = pd.DataFrame(
        {"max_x": max_x.astype(np.float64), "max_y": max_y.astype(np.float64)}
    )

    pd.to_pickle(images_log, os.path.join(HERE, "data_proton_fixture.pkl"))
    pd.to_pickle(cond_df, os.path.join(HERE, "data_cond_fixture.pkl"))
    pd.to_pickle(posi_df, os.path.join(HERE, "data_coord_fixture.pkl"))

    # Golden outputs of the current ingestion pipeline.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
    from zdcsim.config import load_config
    from zdcsim.data.dataset import get_dataset, transform_data_for_training

    cfg = load_config(overrides=[
        f"dataset.DATA_IMAGES_PATH={os.path.join(HERE, 'data_proton_fixture.pkl')}",
        f"dataset.DATA_COND_PATH={os.path.join(HERE, 'data_cond_fixture.pkl')}",
        f"dataset.DATA_POSITIONS_PATH={os.path.join(HERE, 'data_coord_fixture.pkl')}",
        "train.save_experiment_data=false",
        "train.seed=7",
    ])
    ds = get_dataset(cfg)
    split = transform_data_for_training(cfg, ds)
    np.savez(
        os.path.join(HERE, "expected.npz"),
        n_events=ds.n_events,
        photon_sum_min=cfg.photon_sum_min,
        photon_sum_max=cfg.photon_sum_max,
        x_train=split.x_train, x_test=split.x_test,
        y_train=split.y_train, y_test=split.y_test,
        std_train=split.std_train, std_test=split.std_test,
        intensity_train=split.intensity_train, intensity_test=split.intensity_test,
        positions_train=split.positions_train, positions_test=split.positions_test,
        expert_number_train=split.expert_number_train,
        expert_number_test=split.expert_number_test,
        train_indices=split.train_indices, test_indices=split.test_indices,
        scaler_cond_mean=split.scaler_cond.mean_,
        scaler_cond_scale=split.scaler_cond.scale_,
    )
    print(f"fixture written: {N} events -> {ds.n_events} after filter")


if __name__ == "__main__":
    main()
