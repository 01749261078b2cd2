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
Round-2 measured 1.3-1.4x on a 150-epoch checkpoint (BENCH_LOG.md); the
criterion is 1.5x.

Runs the PRODUCTION serving path (bulk int8 tiled-switch — what bench.py
times) on a trained checkpoint. Defaults to the committed r2 150-epoch run's
best epoch; override: ``python fidelity.py <experiment_dir> <epoch> [raw|ema]``.
Serving weights default to the generator EMA shadow (measured better or
equal to raw in 5/6 round-3 study runs, experiments/fidelity_r3.jsonl).
Reference metric semantics: expertsim/train/utils.py:117-176.
"""

from __future__ import annotations

import json
import sys

CRITERION = 1.5  # pass: matched-N ws_mean <= 1.5x the real-vs-real floor
DEFAULT_RUN = "experiments/r2_proton_bf16_150ep_16_08_2026_23_02_30_094054"
DEFAULT_EPOCH = 140
N_DRAWS = 3


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

    exp_dir = sys.argv[1] if len(sys.argv) > 2 else DEFAULT_RUN
    epoch = int(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_EPOCH
    use_ema = (sys.argv[3] if len(sys.argv) > 3 else "ema") == "ema"
    precision = sys.argv[4] if len(sys.argv) > 4 else "int8"

    # The checkpoint's training data recipe (synthetic GEANT4-like set; the
    # split indices reload from the run dir so test membership matches).
    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        f"train.checkpoint_experiment_dir={exp_dir}",
        f"train.epoch_to_load={epoch}",
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
    print(json.dumps({
        "metric": "fastsim_fidelity",
        "value": round(ratio, 3),
        "unit": "x_floor",
        "vs_baseline": round(CRITERION / max(ratio, 1e-9), 3),
        "ws_mean": round(ws_full, 1),
        "ws_mean_rel": round(ws_full / max(scale, 1e-9), 4),
        "ws_real_floor": round(floor, 1),
        "criterion_x_floor": CRITERION,
        "checkpoint": f"{exp_dir}@{epoch}",
        "weights": "ema" if use_ema else "raw",
        "precision": precision,
        "n_test": n,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
