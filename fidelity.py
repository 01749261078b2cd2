#!/usr/bin/env python
"""Physics-fidelity benchmark — the second headline metric next to bench.py.

Prints ONE JSON line:
``{"metric": "fastsim_fidelity", "value": <ws_mean/ws_real_floor>,
"unit": "x_floor", "vs_baseline": <criterion/value>, ...}``.

Acceptance criterion (BASELINE.md): the reference publishes no fidelity
numbers and no GEANT4-trained baseline is reachable in this environment, so
the gate is FLOOR-RELATIVE: matched-sample-size 5-channel W1 of generated-vs-
real must be within CRITERION x the real-vs-real finite-sample floor of the
test split itself (two random halves). ``vs_baseline >= 1.0`` passes.
Measured trajectory: 2.149x at 60 epochs, 1.389x at 150, **1.116x at the
reference-default 250 epochs** (BENCH_LOG.md); the criterion is 1.5x.

Runs the PRODUCTION serving path (bulk int8 tiled-switch — what bench.py
times) on a trained checkpoint. Defaults to the newest on-disk gate run
(see DEFAULT_RUN_GLOBS); when no run dir exists (experiments/ is gitignored
and wiped between rounds) it falls back to the COMMITTED serving-weight
artifact (ARTIFACT_PATH — float16 EMA generator + router, written by
``python experiments/make_gate_artifact_r4.py <run_dir> <epoch>``), so a
fresh clone reproduces the gate number with zero retraining. Override:
``python fidelity.py <experiment_dir|artifact|path.npz> <epoch> [raw|ema]
[precision]`` — a ``.npz`` path gates that committed serving artifact
directly (the distilled students under ``artifacts/gate/``; width/family/
norm come from the artifact metadata, so e.g.
``python fidelity.py artifacts/gate/student_w0.125_serving_weights.npz``
reproduces the production student's gate number). Serving weights default to the generator EMA shadow
(measured better or equal to raw in 5/6 round-3 study runs,
experiments/fidelity_r3.jsonl).
Reference metric semantics: expertsim/train/utils.py:117-176.
"""

from __future__ import annotations

import json
import sys

CRITERION = 1.5  # pass: matched-N ws_mean <= 1.5x the real-vs-real floor
# The criterion was calibrated on 150-epoch checkpoints (BENCH_LOG r2/r4);
# shorter runs measure the training curve, not the serving path — the gate
# emits a warning field when the resolved weights trained fewer epochs.
CALIBRATION_EPOCHS = 150
# Trained gate checkpoints live under experiments/ (gitignored — full Orbax
# TrainStates are too large to commit). The committed artifact below is the
# durable fallback; to regenerate a full checkpoint (~67 min for 250 epochs
# on one v5e chip):
#   python experiments/train_gate_ckpt_r3.py 250 fidelity_ckpt_r4_250ep
# (both train with the in-loop saver disabled — per-epoch Orbax saves cost
# ~160 s/epoch of D2H over the axon tunnel — and write ONE final-state
# checkpoint.)
DEFAULT_RUN_GLOBS = (
    "experiments/fidelity_ckpt_*",
    "experiments/r2_proton_bf16_150ep_*",
)
ARTIFACT_PATH = "artifacts/gate/gate_serving_weights.npz"
N_DRAWS = 3
# Neutron-family students gate relative to their teacher's x-floor (the
# family saturates ~5x floor at synthetic scale — BENCH_LOG "neutron
# 150-epoch arm"); must match experiments/distill_neutron_r4.py.
NEUTRON_REL_CRITERION = 1.10


def _resolve_target(arg1: str | None) -> tuple[str | None, str | None]:
    """Map the first CLI arg to ``(artifact_path, experiment_dir)``.

    ``"artifact"`` gates the committed teacher artifact; any ``*.npz`` path
    gates that serving artifact directly (e.g. the distilled students under
    ``artifacts/gate/``); anything else is an experiment run dir. With no
    arg, the newest on-disk gate run wins, else the committed artifact.
    Exactly one of the two returns non-None (both None = nothing to gate).
    """
    import os

    if arg1 == "artifact":
        return ARTIFACT_PATH, None
    if arg1 is not None and arg1.endswith(".npz"):
        return arg1, None
    exp_dir = arg1 or _resolve_default_run()
    if exp_dir is None and os.path.exists(ARTIFACT_PATH):
        return ARTIFACT_PATH, None
    return None, exp_dir


def _artifact_model_config(meta: dict) -> tuple[list[str], str | None]:
    """Config selection from artifact metadata: distilled students carry
    ``width`` (and ``norm="none"`` for neutron); ``family="neutron"`` swaps
    to the neutron dataset/model recipe (and its own real-vs-real floor).
    Returns ``(extra_overrides, cfg_path)``."""
    import os

    overrides = []
    if "width" in meta:
        overrides.append(f"model.generator.width={float(meta['width'])}")
    if "norm" in meta:
        overrides.append(f"model.norm={meta['norm']}")
    if "generator_version" in meta:
        overrides.append(
            f"model.generator.version={meta['generator_version']}"
        )
    cfg_path = None
    if meta.get("family") == "neutron":
        cfg_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "zdcsim", "config", "neutron.yaml",
        )
    return overrides, cfg_path


def _resolve_default_run() -> str | None:
    import glob
    import os

    for pattern in DEFAULT_RUN_GLOBS:
        runs = [d for d in glob.glob(pattern) if os.path.isdir(d)]
        if runs:
            return max(runs, key=os.path.getmtime)
    return None


def _resolve_latest_epoch(exp_dir: str) -> int | None:
    """Highest saved epoch. With train.checkpoint_keep_best=k the on-disk
    epochs are the k lowest-WS ones, so any of them is a near-best model;
    the latest additionally benefits from the most EMA accumulation."""
    import glob
    import os
    import re

    from zdcsim.utils.io import DIR_MODELS

    models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=exp_dir)
    epochs = [
        int(m.group(1))
        for p in glob.glob(os.path.join(models, "state_epoch_*"))
        if (m := re.search(r"state_epoch_(\d+)$", p))
    ]
    return max(epochs) if epochs else None


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()

    from zdcsim.config import load_config
    from zdcsim.data import get_train_test_data, make_loaders
    from zdcsim.inference import FastSim
    from zdcsim.ops.channels import sum_channels
    from zdcsim.ops.ws import wasserstein_per_channel
    from zdcsim.utils.io import DIR_MODELS

    import os

    arg1 = sys.argv[1] if len(sys.argv) > 1 else None
    art_path, exp_dir = _resolve_target(arg1)
    use_artifact = art_path is not None
    if exp_dir is None and not use_artifact:
        print(json.dumps({
            "metric": "fastsim_fidelity", "value": None,
            "error": "no trained gate checkpoint on disk and no committed "
                     f"artifact at {ARTIFACT_PATH} — regenerate a checkpoint "
                     "with the train_gate_ckpt_r3.py command in this file's "
                     "header (~67 min for 250 epochs on one v5e chip), then "
                     "re-run",
        }))
        return 1
    meta = {}
    if use_artifact:
        from zdcsim.utils.artifact import load_serving_artifact

        gp_art, gs_art, rp_art, meta = load_serving_artifact(art_path)
        epoch = int(float(meta.get("epoch", -1)))
        use_ema = meta.get("weights", "ema") == "ema"
        precision = sys.argv[4] if len(sys.argv) > 4 else "int8"
    else:
        epoch = int(sys.argv[2]) if len(sys.argv) > 2 else _resolve_latest_epoch(exp_dir)
        if epoch is None:
            print(json.dumps({
                "metric": "fastsim_fidelity", "value": None,
                "error": f"no state_epoch_* checkpoints under {exp_dir}",
            }))
            return 1
        use_ema = (sys.argv[3] if len(sys.argv) > 3 else "ema") == "ema"
        precision = sys.argv[4] if len(sys.argv) > 4 else "int8"

    # The checkpoint's training data recipe (synthetic GEANT4-like set). With
    # a run dir the split indices reload from it; the artifact path recomputes
    # them — the whole prep stream is deterministic in train.seed, so test
    # membership is identical either way (verified at artifact creation).
    resume_overrides = [] if use_artifact else [
        f"train.checkpoint_experiment_dir={exp_dir}",
        f"train.epoch_to_load={epoch}",
    ]
    cfg_path = None
    if use_artifact:
        extra, cfg_path = _artifact_model_config(meta)
        resume_overrides.extend(extra)
    cfg = load_config(cfg_path, overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        *resume_overrides,
    ])
    split = get_train_test_data(cfg)
    _, test_loader = make_loaders(cfg, split)
    cond = test_loader.arrays["cond"]
    real = test_loader.arrays["real"]
    ch_real = sum_channels(jnp.expm1(real[..., 0] if real.ndim == 4 else real))
    n = int(cond.shape[0])
    # seeded random halves (ordering-robust floor; ADVICE r2)
    perm = np.random.default_rng(0).permutation(n)
    half = n // 2
    ch_perm = ch_real[perm]
    floor = float(jnp.mean(
        wasserstein_per_channel(ch_perm[:half], ch_perm[half: 2 * half])
    ))
    scale = float(jnp.mean(ch_real))

    if use_artifact:
        from zdcsim.models import build_moe

        engine = FastSim(
            build_moe(cfg), gp_art, gs_art, rp_art,
            batch_size=2048, precision=precision,
        )
    else:
        engine = FastSim.from_checkpoint(
            cfg, DIR_MODELS.format(EXPERIMENT_DIR_NAME=exp_dir), epoch,
            use_ema=use_ema, batch_size=2048, precision=precision,
        )
    ws_full, ws_half = [], []
    for d in range(N_DRAWS):
        showers = engine.simulate_bulk(cond, jax.random.PRNGKey(100 + d))
        ch_gen = sum_channels(jnp.asarray(showers))
        ws_full.append(float(jnp.mean(wasserstein_per_channel(ch_real, ch_gen))))
        # matched sample size vs the floor (W1 finite-sample bias ~ 1/sqrt(N))
        ws_half.append(float(jnp.mean(wasserstein_per_channel(
            ch_perm[:half], ch_gen[perm][half: 2 * half]
        ))))
    ws_full = float(np.mean(ws_full))
    ws_half_m = float(np.mean(ws_half))
    ratio = ws_half_m / max(floor, 1e-9)
    result = {
        "metric": "fastsim_fidelity",
        "value": round(ratio, 3),
        "unit": "x_floor",
        "vs_baseline": round(CRITERION / max(ratio, 1e-9), 3),
        "ws_mean": round(ws_full, 1),
        "ws_mean_rel": round(ws_full / max(scale, 1e-9), 4),
        "ws_real_floor": round(floor, 1),
        "criterion_x_floor": CRITERION,
        "checkpoint": (
            f"{art_path} (from {meta.get('source', '?')})"
            if use_artifact else f"{exp_dir}@{epoch}"
        ),
        "weights": "ema" if use_ema else "raw",
        "precision": precision,
        "n_test": n,
    }
    if use_artifact and "family" in meta:
        result["family"] = meta["family"]
    if meta.get("weights") == "distilled-student":
        result["width"] = float(meta.get("width", 1.0))
        if "teacher_x_floor" in meta:
            result["teacher_x_floor"] = float(meta["teacher_x_floor"])
    # The neutron DCGAN family saturates ~5x floor at synthetic-data scale
    # (BENCH_LOG "neutron 150-epoch arm" — a model-family ceiling, not a
    # training-length artifact), so the absolute proton criterion does not
    # apply: neutron students gate TEACHER-RELATIVE (must hold the teacher's
    # fidelity within NEUTRON_REL_CRITERION), the teacher itself is
    # informational.
    if meta.get("family") == "neutron":
        if "teacher_x_floor" in meta:
            rel_bar = NEUTRON_REL_CRITERION * float(meta["teacher_x_floor"])
            result["criterion"] = (
                f"teacher-relative: <= {NEUTRON_REL_CRITERION}x teacher "
                f"({rel_bar:.3f}x floor)"
            )
            result["vs_baseline"] = round(rel_bar / max(ratio, 1e-9), 3)
        else:
            result["vs_baseline"] = None
            result["criterion"] = (
                "informational (neutron family saturates ~5x floor at "
                "synthetic scale; students gate teacher-relative)"
            )
    if 0 <= epoch + 1 < CALIBRATION_EPOCHS and (
        meta.get("weights") != "distilled-student"
    ):
        result["warning"] = (
            f"weights trained {epoch + 1} epochs; the {CRITERION}x criterion "
            f"was calibrated at {CALIBRATION_EPOCHS} — a FAIL here may be a "
            "training-length artifact, not a serving-path regression"
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
