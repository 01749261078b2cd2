"""Round-4 neutron-family fidelity arm (VERDICT r3 #6).

The 60-epoch fidelity-study protocol (seeds 7/21) on the neutron family:
``norm=group`` (the measured-stable preset default) and the masked-BN
reference-parity variant (``norm=batch``). Every run ends with a
floor-relative serving fidelity measurement on the PRODUCTION neutron
path (FastSim bulk int8 — BN-folded for norm=batch, module bf16+int8
fallback for norm=group), the same criterion fidelity.py gates the
proton flagship on.

Reference: expertsim/models/neutron/generator.py:5-49 (DCGAN+BN family);
metric semantics expertsim/train/utils.py:117-176.

Appends one JSON line per run to experiments/fidelity_r4.jsonl.
Usage: python experiments/fidelity_neutron_r4.py [norm:seed[:epochs] ...]
       (default arms: group:7 group:21 batch:7 batch:21 at 60 epochs;
       the proton gate criterion was calibrated at 150 epochs, so a
       long arm is e.g. group:7:150)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "fidelity_r4.jsonl")

BASE = [
    "dataset.synthetic=true",
    "dataset.synthetic_n_samples=25600",
    "train.batch_size=512",
    "train.epochs=60",
    "train.eval_every=5",
    "model.n_experts=3",
    "train.precision=bf16",
]


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


def run_arm(norm: str, seed: int, epochs: int = 60):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from zdcsim.config import load_config
    from zdcsim.data import get_train_test_data, make_loaders
    from zdcsim.inference import FastSim
    from zdcsim.models import build_moe
    from zdcsim.ops.channels import sum_channels
    from zdcsim.ops.ws import wasserstein_per_channel
    from zdcsim.train.loop import train

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "zdcsim", "config", "neutron.yaml"
    )
    cfg = load_config(
        cfg_path,
        overrides=BASE
        + [f"train.seed={seed}", f"model.norm={norm}",
           f"train.epochs={epochs}"],
    )
    t0 = time.time()
    split = get_train_test_data(cfg)
    history, state = train(cfg, split=split, return_state=True)
    wall = time.time() - t0
    ws_series = [(h["epoch"], h["ws_mean"]) for h in history if "ws_mean" in h]

    # Floor-relative serving fidelity on the production bulk int8 path
    # (EMA weights; BN stats fold at engine build when norm=batch).
    modules = build_moe(cfg)
    _, test_loader = make_loaders(cfg, split)
    cond = test_loader.arrays["cond"]
    real = test_loader.arrays["real"]
    ch_real = sum_channels(jnp.expm1(real[..., 0] if real.ndim == 4 else real))
    n = int(cond.shape[0])
    perm = np.random.default_rng(0).permutation(n)
    half = n // 2
    ch_perm = ch_real[perm]
    floor = float(jnp.mean(
        wasserstein_per_channel(ch_perm[:half], ch_perm[half: 2 * half])
    ))
    fids = {}
    for wtag, use_ema in (("ema", True), ("raw", False)):
        engine = FastSim.from_state(
            modules, state, use_ema=use_ema, batch_size=2048, precision="int8"
        )
        ws_half = []
        for d in range(3):
            showers = engine.simulate_bulk(cond, jax.random.PRNGKey(100 + d))
            ch_gen = sum_channels(jnp.asarray(showers))
            ws_half.append(float(jnp.mean(wasserstein_per_channel(
                ch_perm[:half], ch_gen[perm][half: 2 * half]
            ))))
        fids[wtag] = float(np.mean(ws_half)) / floor

    emit({
        "arm": f"neutron_{norm}" + (f"_e{epochs}" if epochs != 60 else ""),
        "seed": seed, "family": "neutron",
        "norm": norm, "epochs": epochs,
        "ws_best": float(min(w for _, w in ws_series)),
        "ws_final": float(ws_series[-1][1]),
        "fidelity_x_floor_ema": round(fids["ema"], 3),
        "fidelity_x_floor_raw": round(fids["raw"], 3),
        "ws_real_floor": round(floor, 1),
        "wall_s": round(wall, 1),
        "ws_series": [[int(e), round(float(w), 1)] for e, w in ws_series],
    })


def main():
    import logging

    logging.basicConfig(level=logging.INFO)
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()
    arms = [a.split(":") for a in sys.argv[1:]] or [
        ("group", "7"), ("group", "21"), ("batch", "7"), ("batch", "21"),
    ]
    for arm in arms:
        norm, seed = arm[0], int(arm[1])
        epochs = int(arm[2]) if len(arm) > 2 else 60
        run_arm(norm, seed, epochs)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
