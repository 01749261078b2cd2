
import pytest

from zdcsim.config import ConfigNode, apply_overrides, load_config


def test_default_config_loads():
    cfg = load_config()
    assert cfg.model.n_experts == 3
    assert cfg.model.noise_dim == 10
    assert cfg.model.cond_dim == 9
    assert tuple(cfg.dataset.input_image_shape) == (56, 30)
    assert cfg.train.batch_size == 512
    assert cfg.model.router.tau_start == pytest.approx(1.2)


def test_overrides_parse_yaml_scalars():
    cfg = load_config(overrides=[
        "model.n_experts=5",
        "model.generator.lr_g=5e-5",
        "dataset.input_image_shape=[44,44]",
        "train.checkpoint_experiment_dir=null",
        "dataset.MAX_INTENSITY_THRESHOLD=2312",
    ])
    assert cfg.model.n_experts == 5
    assert cfg.model.generator.lr_g == pytest.approx(5e-5)
    assert list(cfg.dataset.input_image_shape) == [44, 44]
    assert cfg.train.checkpoint_experiment_dir is None
    assert cfg.dataset.MAX_INTENSITY_THRESHOLD == 2312


def test_legacy_diff_strength_string_is_normalized():
    # The reference config literally contains `diff_strength: 1-6` (a string).
    cfg = load_config(overrides=["model.router.diff_strength=1-6"])
    assert cfg.model.router.diff_strength == pytest.approx(1e-6)


def test_runtime_key_injection():
    cfg = load_config()
    cfg.photon_sum_min = 1.0
    cfg.data_cond_names = ["Energy", "Vx"]
    assert cfg.photon_sum_min == 1.0
    assert cfg.data_cond_names == ["Energy", "Vx"]


def test_missing_key_raises():
    cfg = load_config()
    with pytest.raises(AttributeError):
        _ = cfg.model.not_a_key


def test_resume_flags_must_pair():
    with pytest.raises(ValueError):
        load_config(overrides=["train.epoch_to_load=10"])


def test_user_yaml_merge(tmp_path):
    p = tmp_path / "user.yaml"
    p.write_text("model:\n  n_experts: 7\ndataset:\n  zdc_type: neutron\n")
    cfg = load_config(str(p))
    assert cfg.model.n_experts == 7
    assert cfg.dataset.zdc_type == "neutron"
    # untouched defaults survive the merge
    assert cfg.model.noise_dim == 10


def test_confignode_select_and_update():
    cfg = ConfigNode({"a": {"b": 1}})
    assert cfg.select("a.b") == 1
    cfg.update_dotted("a.c.d", 3)
    assert cfg.a.c.d == 3
    apply_overrides(cfg, ["a.b=2"])
    assert cfg.a.b == 2


def test_io_roundtrip(tmp_path):
    import numpy as np

    from zdcsim.utils.io import (
        load_scales,
        load_train_test_indices,
        save_scales,
        save_train_test_indices,
    )

    d = str(tmp_path)
    save_scales("proton", np.array([1.0, 2.0]), np.array([0.5, 0.25]), d)
    means, scales = load_scales("proton", d)
    assert means.tolist() == [1.0, 2.0]
    assert scales.tolist() == [0.5, 0.25]

    save_train_test_indices(d, np.arange(5), np.arange(5, 8))
    tr, te = load_train_test_indices(d)
    assert tr.tolist() == [0, 1, 2, 3, 4]
    assert te.tolist() == [5, 6, 7]
