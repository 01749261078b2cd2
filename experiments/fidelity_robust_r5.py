"""Fidelity-gate robustness study (VERDICT r4 #6).

The gate (fidelity.py) measures ws_half/floor with ONE permutation seed
(default_rng(0)) and N_DRAWS=3. This study reports the spread of (a) the
real-vs-real floor and (b) the gate ratio across >=5 permutation seeds and
N_DRAWS in {3, 10}, for the committed proton teacher artifact and the
production w=0.125 student.

Chip cost is one bulk serve per artifact per draw (10 draws); everything
else — floors and ratios across permutation seeds — is host-side numpy on
the CACHED per-draw channel sums, so the seed sweep is free.

Appends one JSON line per artifact to experiments/fidelity_robust_r5.jsonl.
Usage: python experiments/fidelity_robust_r5.py [artifact.npz ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "fidelity_robust_r5.jsonl")
PERM_SEEDS = (0, 1, 2, 3, 4, 5, 6)
N_DRAWS_MAX = 10
DEFAULT_ARTIFACTS = (
    "artifacts/gate/gate_serving_weights.npz",
    "artifacts/gate/student_w0.125_serving_weights.npz",
)


def study(art_path: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zdcsim.config import load_config
    from zdcsim.data import get_train_test_data, make_loaders
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.ops.channels import sum_channels
    from zdcsim.ops.ws import wasserstein_per_channel
    from zdcsim.utils.artifact import load_serving_artifact

    import fidelity as fid

    gp, gs, rp, meta = load_serving_artifact(art_path)
    extra, cfg_path = fid._artifact_model_config(meta)
    cfg = load_config(cfg_path, overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        *extra,
    ])
    split = get_train_test_data(cfg)
    _, test_loader = make_loaders(cfg, split)
    cond = test_loader.arrays["cond"]
    real = test_loader.arrays["real"]
    ch_real = np.asarray(sum_channels(
        jnp.expm1(real[..., 0] if real.ndim == 4 else real)
    ))
    n = int(cond.shape[0])
    half = n // 2

    engine = FastSim(
        build_moe(cfg), gp, gs, rp, batch_size=2048, precision="int8"
    )
    t0 = time.time()
    ch_gen = []  # [D][N, 5] cached per-draw channel sums
    for d in range(N_DRAWS_MAX):
        showers = engine.simulate_bulk(cond, jax.random.PRNGKey(100 + d))
        ch_gen.append(np.asarray(sum_channels(jnp.asarray(showers))))
    serve_s = time.time() - t0

    def w1(a, b):
        return float(jnp.mean(wasserstein_per_channel(
            jnp.asarray(a), jnp.asarray(b)
        )))

    rows = []
    for seed in PERM_SEEDS:
        perm = np.random.default_rng(seed).permutation(n)
        ch_perm = ch_real[perm]
        floor = w1(ch_perm[:half], ch_perm[half: 2 * half])
        ws_half = [
            w1(ch_perm[:half], g[perm][half: 2 * half]) for g in ch_gen
        ]
        rows.append({
            "perm_seed": seed,
            "floor": round(floor, 1),
            "ratio_d3": round(float(np.mean(ws_half[:3])) / floor, 3),
            "ratio_d10": round(float(np.mean(ws_half)) / floor, 3),
        })
        print(f"  seed {seed}: floor {floor:7.1f}  "
              f"ratio(D=3) {rows[-1]['ratio_d3']:.3f}  "
              f"ratio(D=10) {rows[-1]['ratio_d10']:.3f}", flush=True)

    floors = np.array([r["floor"] for r in rows])
    r3 = np.array([r["ratio_d3"] for r in rows])
    r10 = np.array([r["ratio_d10"] for r in rows])
    rec = {
        "artifact": art_path,
        "n_test": n,
        "criterion": fid.CRITERION,
        "floor_mean": round(float(floors.mean()), 1),
        "floor_std": round(float(floors.std()), 1),
        "ratio_d3_mean": round(float(r3.mean()), 3),
        "ratio_d3_std": round(float(r3.std()), 3),
        "ratio_d3_max": round(float(r3.max()), 3),
        "ratio_d10_mean": round(float(r10.mean()), 3),
        "ratio_d10_std": round(float(r10.std()), 3),
        "ratio_d10_max": round(float(r10.max()), 3),
        "rows": rows,
        "serve_s": round(serve_s, 1),
        "ts": time.time(),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(
        {k: v for k, v in rec.items() if k != "rows"}
    ), flush=True)


def main():
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    arts = sys.argv[1:] or [a for a in DEFAULT_ARTIFACTS if os.path.exists(a)]
    for a in arts:
        print(f"--- {a} ---", flush=True)
        study(a)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
