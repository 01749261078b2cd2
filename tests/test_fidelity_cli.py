"""fidelity.py target/config resolution — the gate must pick the right
serving artifact and model config from one CLI arg + artifact metadata
(pure helpers; the full gate itself runs on the chip)."""

import sys

sys.path.insert(0, "/root/repo")

import os

import pytest

import fidelity


def test_resolve_target_npz_path():
    art, exp = fidelity._resolve_target("artifacts/gate/student_w0.125_serving_weights.npz")
    assert art == "artifacts/gate/student_w0.125_serving_weights.npz"
    assert exp is None


def test_resolve_target_artifact_keyword():
    art, exp = fidelity._resolve_target("artifact")
    assert art == fidelity.ARTIFACT_PATH and exp is None


def test_resolve_target_run_dir():
    art, exp = fidelity._resolve_target("experiments/some_run_dir")
    assert art is None and exp == "experiments/some_run_dir"


def test_resolve_target_default_falls_back_to_committed_artifact():
    # No gate run dirs exist on a fresh clone; the committed artifact wins.
    if not os.path.exists(os.path.join("/root/repo", fidelity.ARTIFACT_PATH)):
        pytest.skip("committed gate artifact absent")
    cwd = os.getcwd()
    os.chdir("/root/repo")
    try:
        if fidelity._resolve_default_run() is not None:
            pytest.skip("an on-disk gate run dir exists; default resolves to it")
        art, exp = fidelity._resolve_target(None)
        assert art == fidelity.ARTIFACT_PATH and exp is None
    finally:
        os.chdir(cwd)


def test_artifact_model_config_proton_student():
    overrides, cfg_path = fidelity._artifact_model_config(
        {"weights": "distilled-student", "width": "0.125"}
    )
    assert overrides == ["model.generator.width=0.125"]
    assert cfg_path is None


def test_artifact_model_config_neutron_student():
    overrides, cfg_path = fidelity._artifact_model_config(
        {"weights": "distilled-student", "family": "neutron",
         "width": "0.5", "norm": "none"}
    )
    assert "model.generator.width=0.5" in overrides
    assert "model.norm=none" in overrides
    assert cfg_path is not None and cfg_path.endswith("neutron.yaml")
    assert os.path.exists(cfg_path)


def test_artifact_model_config_teacher_plain():
    overrides, cfg_path = fidelity._artifact_model_config(
        {"weights": "ema", "epoch": "249"}
    )
    assert overrides == [] and cfg_path is None
