"""Data subsystem tests: prep (notebook-equivalents), scalers, dataset
transform, loaders, native kernels."""

import numpy as np

from zdcsim.config import load_config
from zdcsim.data.prep import (
    COND_COLUMNS,
    diversity_std,
    filter_photon_sum,
    group_by_condition,
    max_coordinates,
    pair_same_condition,
    photon_sums,
    prepare_dataset,
)
from zdcsim.data.scalers import MinMaxScaler, StandardScaler
from zdcsim.data.synthetic import make_synthetic_dataset
from zdcsim.data.dataset import get_dataset, get_train_test_data
from zdcsim.data.loader import DeviceLoader, make_loaders


def synth_cfg(**over):
    base = [
        "dataset.synthetic=true",
        "dataset.synthetic_n_samples=256",
        "train.batch_size=32",
        "dataset.MIN_INTENSITY_THRESHOLD=1",
    ]
    return load_config(overrides=base + [f"{k}={v}" for k, v in over.items()])


# ---------------------------------------------------------------------------
# scalers vs sklearn
# ---------------------------------------------------------------------------

def test_standard_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler as SkStd

    x = rng.normal(3.0, 2.0, (200, 5)).astype(np.float32)
    ours, sk = StandardScaler(), SkStd()
    np.testing.assert_allclose(ours.fit_transform(x), sk.fit_transform(x), atol=1e-5)
    np.testing.assert_allclose(ours.inverse_transform(ours.transform(x)), x, atol=1e-4)


def test_minmax_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import MinMaxScaler as SkMM

    x = rng.normal(0.0, 5.0, (100, 3)).astype(np.float32)
    ours, sk = MinMaxScaler(), SkMM()
    np.testing.assert_allclose(ours.fit_transform(x), sk.fit_transform(x), atol=1e-5)


# ---------------------------------------------------------------------------
# prep functions
# ---------------------------------------------------------------------------

def test_photon_sums_and_filter(rng):
    imgs = rng.random((50, 6, 4)).astype(np.float32) * 10
    sums = photon_sums(imgs)
    np.testing.assert_allclose(sums, imgs.reshape(50, -1).sum(1), rtol=1e-5)
    mask = filter_photon_sum(sums, min_sum=100.0)
    assert np.array_equal(mask, sums >= 100.0)


def test_max_coordinates_matches_argmax(rng):
    imgs = rng.random((30, 8, 5)).astype(np.float32)
    coords = max_coordinates(imgs)
    flat = imgs.reshape(30, -1).argmax(1)
    np.testing.assert_array_equal(coords[:, 0], flat // 5)
    np.testing.assert_array_equal(coords[:, 1], flat % 5)


def test_grouping_and_pairing(rng):
    cond = np.repeat(rng.normal(size=(10, 9)), 4, axis=0)  # 10 groups of 4
    gids = group_by_condition(cond)
    assert len(np.unique(gids)) == 10
    pair = pair_same_condition(gids, np.random.default_rng(0))
    # every pair partner has identical conditioning
    np.testing.assert_array_equal(gids[pair], gids)
    # pairing is a permutation within groups
    assert sorted(pair.tolist()) == list(range(40))


def test_diversity_std_group_semantics(rng):
    imgs = rng.random((12, 4, 4)).astype(np.float32)
    gids = np.array([0] * 4 + [1] * 4 + [2] * 4)
    std = diversity_std(imgs, gids)
    # same value within group, max-normalized to peak 1
    for g in range(3):
        assert np.allclose(std[gids == g], std[gids == g][0])
    assert np.isclose(std.max(), 1.0)
    # singleton groups get zero
    std2 = diversity_std(imgs, np.arange(12))
    assert np.all(std2 == 0.0)


def test_diversity_std_matches_numpy_reference(rng):
    imgs = rng.random((40, 5, 3)).astype(np.float32)
    gids = rng.integers(0, 8, 40)
    got = diversity_std(imgs, gids)
    exp = np.zeros(40)
    flat = imgs.reshape(40, -1).astype(np.float64)
    for g in np.unique(gids):
        seg = np.flatnonzero(gids == g)
        if seg.size > 1:
            exp[seg] = flat[seg].std(axis=0).sum()
    if exp.max() > 0:
        exp = exp / exp.max()
    np.testing.assert_allclose(got, exp, atol=1e-5)


# ---------------------------------------------------------------------------
# synthetic dataset + full transform
# ---------------------------------------------------------------------------

def test_synthetic_dataset_schema():
    ds = make_synthetic_dataset(128, (56, 30), "proton", seed=1)
    assert ds.images.shape == (128, 56, 30)
    assert ds.positions.shape == (128, 2)
    for c in COND_COLUMNS:
        assert ds.cond[c].shape == (128,)
    assert "proton_photon_sum" in ds.cond
    assert "std_proton" in ds.cond
    # images are log1p space: all non-negative
    assert ds.images.min() >= 0.0
    # duplicated-condition groups exist (group_size=4)
    assert len(np.unique(ds.cond["group_number_proton"])) < 128


def test_neutron_synthetic_schema():
    ds = make_synthetic_dataset(64, (44, 44), "neutron", seed=2)
    assert ds.images.shape == (64, 44, 44)
    assert "neutron_photon_sum" in ds.cond and "std" in ds.cond


def test_transform_and_split_roundtrip():
    cfg = synth_cfg()
    split = get_train_test_data(cfg)
    n = 256
    assert split.x_train.shape[0] + split.x_test.shape[0] == n
    assert split.x_test.shape[0] == int(round(n * 0.2))
    # cond standardized
    assert abs(split.y_train.mean()) < 0.2
    # std minmax-scaled into [0, 1]
    allstd = np.concatenate([split.std_train, split.std_test])
    assert allstd.min() >= 0.0 and allstd.max() <= 1.0 + 1e-6
    # intensity raw (linear photon counts, large values)
    assert split.intensity_train.max() > 100
    # split indices disjoint + exhaustive
    assert len(np.intersect1d(split.train_indices, split.test_indices)) == 0
    assert len(split.train_indices) + len(split.test_indices) == n


def test_photon_sum_filter_applied():
    cfg = synth_cfg(**{"dataset.MIN_INTENSITY_THRESHOLD": 5000})
    ds = get_dataset(cfg)
    assert ds.cond["proton_photon_sum"].min() >= 5000
    assert cfg.photon_sum_min >= 5000


def test_stratified_subsample():
    cfg = synth_cfg(**{"dataset.read_n_samples": 100})
    ds = get_dataset(cfg)
    assert ds.n_events == 100


# ---------------------------------------------------------------------------
# device loader
# ---------------------------------------------------------------------------

def test_device_loader_batching(rng):
    arrays = {"a": rng.random((100, 3)).astype(np.float32), "b": rng.random(100).astype(np.float32)}
    loader = DeviceLoader(arrays, batch_size=32, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # remainder dropped
    assert batches[0]["a"].shape == (32, 3)
    # deterministic per epoch index
    again = list(loader.epoch(0))
    np.testing.assert_array_equal(np.asarray(batches[0]["a"]), np.asarray(again[0]["a"]))
    # different epoch -> different order
    other = list(loader.epoch(1))
    assert not np.array_equal(np.asarray(batches[0]["a"]), np.asarray(other[0]["a"]))


def test_make_loaders_shapes():
    cfg = synth_cfg()
    split = get_train_test_data(cfg)
    train_loader, test_loader = make_loaders(cfg, split)
    batch = next(iter(train_loader.epoch(0)))
    b = int(cfg.train.batch_size)
    assert batch["real"].shape == (b, 56, 30, 1)
    assert batch["cond"].shape == (b, 9)
    assert batch["std"].shape == (b, 1)
    assert batch["intensity"].shape == (b, 1)
    assert batch["positions"].shape == (b, 2)


def test_stratified_batches_config_wiring():
    """train.stratified_batches=true routes expert labels into the train
    loader end to end (VERDICT r3 #8): every batch approximates the global
    expert-label mix instead of a plain permutation's binomial scatter."""
    cfg = synth_cfg(**{"train.stratified_batches": "true"})
    split = get_train_test_data(cfg)
    train_loader, _ = make_loaders(cfg, split)
    assert train_loader.stratify_labels is not None
    np.testing.assert_array_equal(
        train_loader.stratify_labels, np.asarray(split.expert_number_train)
    )
    labels = np.asarray(split.expert_number_train).ravel()
    classes, global_counts = np.unique(labels, return_counts=True)
    bs = train_loader.batch_size
    order_dev = []  # recover each batch's label mix via the loaded std column
    std_train = np.asarray(split.std_train).ravel()
    for batch in train_loader.epoch(0):
        got_std = np.asarray(batch["std"]).ravel()
        # map rows back to indices via unique std values (synthetic set:
        # continuous draws, unique with probability 1)
        idx = np.searchsorted(np.sort(std_train), got_std)
        rows = np.argsort(std_train)[idx]
        order_dev.append(rows)
    for rows in order_dev:
        counts = np.bincount(labels[rows], minlength=classes.max() + 1)
        expected = global_counts * (bs / labels.size)
        assert np.all(np.abs(counts[classes] - expected) <= np.maximum(3, 0.5 * expected))
    # default (off) keeps the plain permutation path
    cfg_off = synth_cfg()
    split_off = get_train_test_data(cfg_off)
    loader_off, _ = make_loaders(cfg_off, split_off)
    assert loader_off.stratify_labels is None


# ---------------------------------------------------------------------------
# native kernels (numpy parity; skip silently falls back if no toolchain)
# ---------------------------------------------------------------------------

def test_native_gather_rows(rng):
    from zdcsim import native

    src = rng.random((50, 7, 3)).astype(np.float32)
    idx = rng.integers(0, 50, 16)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_stratified_batch_order(rng):
    from zdcsim.data.loader import stratified_batch_order

    labels = np.array([0] * 60 + [1] * 30 + [2] * 10)
    order = stratified_batch_order(labels, batch_size=20, rng=np.random.default_rng(0))
    assert sorted(order.tolist()) == list(range(100))
    # each batch of 20 approximates the 6:3:1 global mix
    for b in range(5):
        batch_labels = labels[order[b * 20 : (b + 1) * 20]]
        counts = np.bincount(batch_labels, minlength=3)
        assert abs(counts[0] - 12) <= 3 and abs(counts[1] - 6) <= 3 and abs(counts[2] - 2) <= 2


def test_prep_pickle_roundtrip(tmp_path, rng):
    """prepare_dataset -> reference-format pickles -> get_dataset."""
    from zdcsim.data.prep import prepare_dataset, save_prepared
    from zdcsim.data.synthetic import _render_showers, _sample_kinematics

    kin = _sample_kinematics(np.random.default_rng(0), 32, "proton")
    raw = _render_showers(np.random.default_rng(1), kin, (8, 6))
    ds = prepare_dataset(raw, kin, "proton")
    pi, pc, pp = str(tmp_path / "i.pkl"), str(tmp_path / "c.pkl"), str(tmp_path / "p.pkl")
    save_prepared(ds, pi, pc, pp)

    cfg = load_config(overrides=[
        f"dataset.DATA_IMAGES_PATH={pi}",
        f"dataset.DATA_COND_PATH={pc}",
        f"dataset.DATA_POSITIONS_PATH={pp}",
        "dataset.MIN_INTENSITY_THRESHOLD=null",
        "dataset.input_image_shape=[8, 6]",
    ])
    loaded = get_dataset(cfg)
    assert loaded.n_events == ds.n_events
    np.testing.assert_allclose(loaded.images, ds.images, rtol=1e-6)
    np.testing.assert_allclose(loaded.positions, ds.positions, rtol=1e-6)


def test_prepare_dataset_diversity_in_log_space(rng):
    """The SDI-GAN std target is computed on log1p images (reference notebook
    order: data_filtering log-transform precedes the diversity std)."""
    from zdcsim.data.prep import (
        diversity_std, group_by_condition, log_transform, prepare_dataset,
    )
    from zdcsim.data.synthetic import _render_showers, _sample_kinematics

    kin = _sample_kinematics(np.random.default_rng(0), 32, "proton")
    # duplicate conditioning rows so groups have size > 1
    for k in kin:
        kin[k] = np.concatenate([kin[k], kin[k]])
    raw = _render_showers(np.random.default_rng(1), kin, (8, 6))
    ds = prepare_dataset(raw, kin, "proton")
    gids = group_by_condition(np.stack([kin[c] for c in
                                        ("Energy", "Vx", "Vy", "Vz", "Px", "Py", "Pz",
                                         "mass", "charge")], axis=1))
    expected = diversity_std(log_transform(raw), gids)
    np.testing.assert_allclose(ds.cond["std_proton"], expected, rtol=1e-6)
    wrong = diversity_std(raw, gids)
    assert not np.allclose(ds.cond["std_proton"], wrong)


def test_prep_cli_main(tmp_path, rng):
    """The offline-prep CLI end to end (notebook-equivalent pipeline)."""
    import pandas as pd

    from zdcsim.data import prep as prep_mod
    from zdcsim.data.synthetic import _render_showers, _sample_kinematics

    kin = _sample_kinematics(np.random.default_rng(0), 24, "proton")
    raw = _render_showers(np.random.default_rng(1), kin, (8, 6))
    raw_images_p = str(tmp_path / "raw_images.pkl")
    raw_cond_p = str(tmp_path / "raw_cond.pkl")
    pd.to_pickle(raw, raw_images_p)
    pd.to_pickle(pd.DataFrame(kin), raw_cond_p)
    out_i, out_c, out_p = (str(tmp_path / f"out_{x}.pkl") for x in "icp")
    prep_mod.main([
        "--raw-images", raw_images_p, "--raw-cond", raw_cond_p,
        "--zdc-type", "proton", "--min-photon-sum", "1",
        "--out-images", out_i, "--out-cond", out_c, "--out-positions", out_p,
    ])
    images = pd.read_pickle(out_i)
    cond = pd.read_pickle(out_c)
    posi = pd.read_pickle(out_p)
    assert images.shape[1:] == (8, 6)
    assert "proton_photon_sum" in cond.columns and "std_proton" in cond.columns
    assert list(posi.columns) == ["max_x", "max_y"]


def test_native_numpy_fallbacks(monkeypatch, rng):
    """All native bindings must agree with their numpy fallbacks when the
    shared library is unavailable."""
    from zdcsim import native

    imgs = rng.random((20, 5, 4)).astype(np.float32)
    gids = rng.integers(0, 4, 20)
    idx = rng.integers(0, 20, 8)
    with_lib = (
        native.photon_sums(imgs), native.max_coords(imgs),
        native.group_pixel_std(imgs, gids), native.gather_rows(imgs, idx),
    )
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    without = (
        native.photon_sums(imgs), native.max_coords(imgs),
        native.group_pixel_std(imgs, gids), native.gather_rows(imgs, idx),
    )
    for a, b in zip(with_lib, without):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_dataset_analysis_report(tmp_path):
    """Report generation covers the reference notebooks' analysis_report.txt
    (coordinate stats, photon-sum quartiles, intensity correlations)."""
    import numpy as np

    from zdcsim.evals.report import dataset_analysis_report

    rng = np.random.default_rng(0)
    imgs = rng.gamma(0.2, 10.0, size=(32, 12, 8)) * (rng.random((32, 12, 8)) < 0.2)
    text = dataset_analysis_report(imgs, n_before_filter=40, title="test set")
    for needle in (
        "Coordinate Distribution Analysis", "Reducing the data from: 40 to 32",
        "max_x", "center_y", "Photon-Sum Analysis", "quartiles",
        "Correlation between mean image intensity and max_y",
        "Analysis Complete",
    ):
        assert needle in text, needle


def test_prep_cli_report(tmp_path):
    """--report writes analysis_report.txt next to the prepared pickles."""
    import os

    import numpy as np
    import pytest

    pd = pytest.importorskip("pandas")
    from zdcsim.data.prep import COND_COLUMNS, main

    rng = np.random.default_rng(1)
    n = 16
    imgs = rng.gamma(0.2, 10.0, size=(n, 10, 6)) * (rng.random((n, 10, 6)) < 0.3)
    cond_df = pd.DataFrame({c: rng.normal(size=n) for c in COND_COLUMNS})
    pd.to_pickle(imgs, tmp_path / "raw_imgs.pkl")
    pd.to_pickle(cond_df, tmp_path / "raw_cond.pkl")
    main([
        "--raw-images", str(tmp_path / "raw_imgs.pkl"),
        "--raw-cond", str(tmp_path / "raw_cond.pkl"),
        "--zdc-type", "proton",
        "--out-images", str(tmp_path / "out_imgs.pkl"),
        "--out-cond", str(tmp_path / "out_cond.pkl"),
        "--out-positions", str(tmp_path / "out_pos.pkl"),
        "--report",
    ])
    report = tmp_path / "analysis_report.txt"
    assert report.exists()
    assert "Analysis Complete" in report.read_text()
