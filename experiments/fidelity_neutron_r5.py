"""Round-5 neutron-family fidelity arms (VERDICT r4 #1).

Extends the round-4 protocol (experiments/fidelity_neutron_r4.py) with the
alternative-architecture arm: ``model.generator.version=v2`` selects the
proton-recipe GN/LN generator re-dimensioned for 44x44
(zdcsim.models.neutron.GeneratorNeutronV2). The VERDICT criterion: a
neutron family member passes the ABSOLUTE 1.5x-floor gate, or >=2 seeds x
>=2 architectures x 250 epochs all plateau — only then does the
teacher-relative criterion (fidelity.py NEUTRON_REL_CRITERION) stand.

Reference bar being studied: the checkpoint gate ``ws_mean < 3`` applies to
neutron runs exactly as to proton (expertsim/train/hooks.py:118-120).

Appends one JSON line per run to experiments/fidelity_r5.jsonl.
Usage: python experiments/fidelity_neutron_r5.py [norm:seed:epochs[:version] ...]
       e.g. group:7:250:v2 group:21:250:v2
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "fidelity_r5.jsonl")

BASE = [
    "dataset.synthetic=true",
    "dataset.synthetic_n_samples=25600",
    "train.batch_size=512",
    "train.eval_every=5",
    "model.n_experts=3",
    "train.precision=bf16",
]


def emit(rec):
    rec["ts"] = time.time()
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


def run_arm(norm: str, seed: int, epochs: int = 250, version: str = "v1"):
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
           f"train.epochs={epochs}", f"model.generator.version={version}"],
    )
    t0 = time.time()
    split = get_train_test_data(cfg)
    history, state = train(cfg, split=split, return_state=True)
    wall = time.time() - t0
    ws_series = [(h["epoch"], h["ws_mean"]) for h in history if "ws_mean" in h]

    # Floor-relative serving fidelity on the production bulk path (EMA and
    # raw weights; int8 applies where a fast path exists, else module bf16).
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

    # Persist the serving weights (fp16 EMA + raw generator + router): a
    # passing arm must be committable as a gate artifact, and a better
    # teacher is re-distillable — the round-4 harness dropped its states.
    art = os.path.join(
        os.path.dirname(__file__),
        f"neutron_{norm}_{version}_s{seed}_e{epochs}_serving.npz",
    )
    from zdcsim.utils.artifact import save_serving_artifact

    save_serving_artifact(
        art, state.ema_gen_params, state.gen.stats, state.router.params,
        meta={"family": "neutron", "norm": norm, "weights": "ema",
              "epoch": epochs - 1, "generator_version": version,
              "source": f"fidelity_neutron_r5 {norm}:{seed}:{epochs}:{version}",
              "fidelity_x_floor": round(fids["ema"], 3)},
    )

    emit({
        "artifact": art,
        "arm": f"neutron_{norm}_{version}_e{epochs}",
        "seed": seed, "family": "neutron",
        "norm": norm, "epochs": epochs, "version": version,
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
        ("group", "7", "250", "v2"), ("group", "21", "250", "v2"),
    ]
    for arm in arms:
        norm, seed = arm[0], int(arm[1])
        epochs = int(arm[2]) if len(arm) > 2 else 250
        version = arm[3] if len(arm) > 3 else "v1"
        run_arm(norm, seed, epochs, version)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
