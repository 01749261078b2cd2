"""Dataset ingestion and the train/test transform.

Capability-parity port of the reference's runtime data pipeline
(expertsim/utils/data_transformations.py:23-257): pickle loading, photon-sum
filtering, stratified subsampling, same-condition pairing, diversity-std
MinMax scaling, intensity extraction, conditioning StandardScaler, unscaled
aux-regressor coordinates, persisted train/test split indices for resume.

Representation: plain numpy arrays end to end (pandas only at the pickle
boundary); the result is a :class:`SplitArrays` of static-shaped arrays that
:mod:`zdcsim.data.loader` uploads to device HBM once.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from zdcsim.data.prep import COND_COLUMNS, PreparedDataset, pair_same_condition
from zdcsim.data.scalers import MinMaxScaler, StandardScaler
from zdcsim.utils.io import (
    DIR_INFO,
    DIR_MODELS,
    create_dir,
    load_train_test_indices,
    save_scales,
    save_train_test_indices,
)

log = logging.getLogger(__name__)


@dataclass
class SplitArrays:
    """Train/test arrays plus fitted scalers and bookkeeping.

    Mirrors the reference's 14-tuple return (data_transformations.py:223-257)
    as named fields. Images are log1p-space [N, H, W]; ``cond`` is the
    standardized 9-dim conditioning; ``std`` the MinMax-scaled diversity
    target [N, 1]; ``intensity`` the raw linear photon sum [N, 1];
    ``positions`` the unscaled (max_x, max_y) [N, 2].
    """

    x_train: np.ndarray
    x_test: np.ndarray
    x_train_2: np.ndarray  # same-condition paired images (kept for parity)
    x_test_2: np.ndarray
    y_train: np.ndarray
    y_test: np.ndarray
    std_train: np.ndarray
    std_test: np.ndarray
    intensity_train: np.ndarray
    intensity_test: np.ndarray
    positions_train: np.ndarray
    positions_test: np.ndarray
    expert_number_train: np.ndarray
    expert_number_test: np.ndarray
    train_indices: np.ndarray
    test_indices: np.ndarray
    scaler_cond: StandardScaler
    scaler_std: MinMaxScaler
    data_cond_names: Tuple[str, ...] = COND_COLUMNS
    dir_models: Optional[str] = None

    @property
    def image_shape(self) -> Tuple[int, int]:
        return tuple(self.x_train.shape[-2:])


def _load_pickles(cfg) -> PreparedDataset:
    """Read the three reference-format training pickles into a PreparedDataset."""
    import pandas as pd

    limit = cfg.get("limit_samples")
    data = np.asarray(pd.read_pickle(cfg.dataset.DATA_IMAGES_PATH), np.float32)
    cond_df = pd.read_pickle(cfg.dataset.DATA_COND_PATH)
    posi_df = pd.read_pickle(cfg.dataset.DATA_POSITIONS_PATH)
    if limit is not None:
        data, cond_df, posi_df = data[:limit], cond_df[:limit], posi_df[:limit]
    cond = {c: cond_df[c].to_numpy() for c in cond_df.columns}
    positions = np.stack(
        [posi_df["max_x"].to_numpy(np.float32), posi_df["max_y"].to_numpy(np.float32)], axis=1
    )
    return PreparedDataset(images=data, cond=cond, positions=positions, zdc_type=cfg.dataset.zdc_type)


def _stratified_subsample(
    sums: np.ndarray, n_samples: int, rng: np.random.Generator, n_bins: int = 1000
) -> np.ndarray:
    """Uniform-per-quantile-bin subsample of event indices
    (reference data_transformations.py:73-116: pd.qcut into 1000 bins, equal
    draw per bin, random top-up to n_samples)."""
    n = sums.shape[0]
    n_bins = min(n_bins, n)
    # Quantile bin of each event (equivalent to pd.qcut with duplicates drop).
    order = np.argsort(sums, kind="stable")
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n)
    bins = ranks * n_bins // n
    per_bin = max(1, n_samples // n_bins)
    selected = []
    for b in np.unique(bins):
        members = np.flatnonzero(bins == b)
        take = min(per_bin, members.size)
        selected.extend(rng.choice(members, size=take, replace=False))
    selected = list(dict.fromkeys(selected))
    if len(selected) < n_samples:
        pool = np.setdiff1d(np.arange(n), np.asarray(selected, dtype=np.int64))
        extra = rng.choice(pool, size=min(n_samples - len(selected), pool.size), replace=False)
        selected.extend(extra)
    return np.asarray(selected[:n_samples], dtype=np.int64)


def get_dataset(cfg, rng: Optional[np.random.Generator] = None) -> PreparedDataset:
    """Load (or synthesize) the dataset, apply photon-sum filters and optional
    stratified subsampling; stamps ``cfg.photon_sum_min/max`` like the
    reference (data_transformations.py:118-125)."""
    rng = rng or np.random.default_rng(int(cfg.train.seed))
    if cfg.dataset.get("synthetic", False):
        from zdcsim.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(
            int(cfg.dataset.synthetic_n_samples),
            tuple(cfg.dataset.input_image_shape),
            zdc_type=cfg.dataset.zdc_type,
            seed=int(cfg.train.seed),
        )
    else:
        ds = _load_pickles(cfg)

    sum_col = f"{cfg.dataset.zdc_type}_photon_sum"
    sums = np.asarray(ds.cond[sum_col], np.float64)
    mask = np.ones(sums.shape[0], dtype=bool)
    lo, hi = cfg.dataset.MIN_INTENSITY_THRESHOLD, cfg.dataset.MAX_INTENSITY_THRESHOLD
    if lo is not None:
        mask &= sums >= lo
    if hi is not None:
        mask &= sums <= hi
    if not mask.all():
        ds = PreparedDataset(
            images=ds.images[mask],
            cond={k: np.asarray(v)[mask] for k, v in ds.cond.items()},
            positions=ds.positions[mask],
            zdc_type=ds.zdc_type,
        )
        sums = sums[mask]

    n_samples = cfg.dataset.get("read_n_samples")
    if n_samples is not None and n_samples < sums.shape[0]:
        idx = _stratified_subsample(sums, int(n_samples), rng)
        ds = PreparedDataset(
            images=ds.images[idx],
            cond={k: np.asarray(v)[idx] for k, v in ds.cond.items()},
            positions=ds.positions[idx],
            zdc_type=ds.zdc_type,
        )
        sums = sums[idx]

    cfg.photon_sum_min = float(sums.min())
    cfg.photon_sum_max = float(sums.max())
    log.info("Dataset: %d events, photon sum in [%.1f, %.1f]",
             ds.n_events, cfg.photon_sum_min, cfg.photon_sum_max)
    return ds


def transform_data_for_training(
    cfg, ds: PreparedDataset, rng: Optional[np.random.Generator] = None
) -> SplitArrays:
    """Pairing, scaling, and the persisted train/test split.

    Reference: data_transformations.py:131-257. On resume
    (``checkpoint_experiment_dir`` + ``epoch_to_load`` set) the saved split
    indices are reloaded so train/test membership is identical.
    """
    rng = rng or np.random.default_rng(int(cfg.train.seed))
    experiment_dir = cfg.config.get("experiment_dir", cfg.config.run_name)
    dir_info = DIR_INFO.format(EXPERIMENT_DIR_NAME=experiment_dir)
    dir_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=experiment_dir)
    cfg.train.dir_info = dir_info
    cfg.train.dir_models = dir_models

    zdc = cfg.dataset.zdc_type
    std_col = "std_proton" if zdc == "proton" else "std"
    group_col = "group_number_proton" if zdc == "proton" else "group_number"
    sum_col = f"{zdc}_photon_sum"

    images = ds.images.astype(np.float32)
    n = images.shape[0]

    group_ids = np.asarray(
        ds.cond.get(group_col, np.arange(n, dtype=np.int64)), np.int64
    )
    pair_idx = pair_same_condition(group_ids, rng)
    images_2 = images[pair_idx]

    scaler_std = MinMaxScaler()
    std = scaler_std.fit_transform(np.asarray(ds.cond[std_col], np.float32).reshape(-1, 1))
    intensity = np.asarray(ds.cond[sum_col], np.float32).reshape(-1, 1)
    expert_number = np.asarray(ds.cond.get("expert_number", np.zeros(n)), np.int64)

    scaler_cond = StandardScaler()
    cond = scaler_cond.fit_transform(ds.cond_matrix())
    positions = ds.positions.astype(np.float32)  # deliberately unscaled (:193-195)

    resume = cfg.train.checkpoint_experiment_dir is not None and cfg.train.epoch_to_load is not None
    if resume:
        ckpt_info = DIR_INFO.format(EXPERIMENT_DIR_NAME=cfg.train.checkpoint_experiment_dir)
        train_idx, test_idx = load_train_test_indices(ckpt_info)
    else:
        indices = np.arange(n)
        if cfg.dataset.shuffle_train_test_split:
            indices = rng.permutation(n)
        n_test = int(round(n * float(cfg.dataset.test_size)))
        test_idx, train_idx = indices[:n_test], indices[n_test:]

    # Persist scalers + split indices into THIS run's dir even on resume, so
    # runs chained from a resumed run can themselves be resumed.
    if cfg.train.save_experiment_data:
        create_dir(dir_info)
        save_scales(zdc, scaler_cond.mean_, scaler_cond.scale_, dir_info)
        create_dir(dir_models)
        save_train_test_indices(dir_info, train_indices=train_idx, test_indices=test_idx)

    sel = lambda a: (a[train_idx], a[test_idx])
    x_train, x_test = sel(images)
    x2_train, x2_test = sel(images_2)
    y_train, y_test = sel(cond)
    std_train, std_test = sel(std)
    int_train, int_test = sel(intensity)
    pos_train, pos_test = sel(positions)
    exp_train, exp_test = sel(expert_number)

    cfg.data_cond_names = list(COND_COLUMNS)
    log.info("Split: %d train / %d test", x_train.shape[0], x_test.shape[0])
    return SplitArrays(
        x_train=x_train, x_test=x_test,
        x_train_2=x2_train, x_test_2=x2_test,
        y_train=y_train, y_test=y_test,
        std_train=std_train, std_test=std_test,
        intensity_train=int_train, intensity_test=int_test,
        positions_train=pos_train, positions_test=pos_test,
        expert_number_train=exp_train, expert_number_test=exp_test,
        train_indices=np.asarray(train_idx), test_indices=np.asarray(test_idx),
        scaler_cond=scaler_cond, scaler_std=scaler_std,
        dir_models=dir_models if cfg.train.save_experiment_data else None,
    )


def get_train_test_data(cfg) -> SplitArrays:
    """One-call pipeline: ingest -> filter -> transform -> split (the analog
    of reference ``get_train_test_data_loaders``, data_transformations.py:260)."""
    rng = np.random.default_rng(int(cfg.train.seed))
    ds = get_dataset(cfg, rng)
    return transform_data_for_training(cfg, ds, rng)
