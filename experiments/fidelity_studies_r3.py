"""Round-3 fidelity studies on the real chip (VERDICT items 3 + 5).

One process, runs sequentially (remote compiles don't cache across
processes — CLAUDE.md):

  0. neutron norm=batch with MASKED per-expert BN statistics, 60 epochs —
     the A/B against round-2's GroupNorm run (same seed/recipe; round-2's
     full-batch-stats BN blew up at step 0: gen_loss 105,690).
  1. base proton arm (sdi_pairwise_quirk=false, differentiable_gan_term=true),
     seeds 7 & 21.
  2. sdi_pairwise_quirk=true, seeds 7 & 21   (ops/losses.py:98-112;
     reference moe.py:573-588 broadcasts [B,1]/[B] into [B,B]).
  3. differentiable_gan_term=false (reference-faithful constant router GAN
     term, moe.py:176-207), seeds 7 & 21.

Every proton run finishes with an EMA-vs-raw serving-weights evaluation on
the SAME test split and keys (train.ema_decay default 0.99; reference's
EMAHelper was dead code, loop.py:380-418).

Appends one JSON line per run to experiments/fidelity_r3.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "fidelity_r3.jsonl")

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


def run_proton(tag, seed, extra):
    import jax
    from zdcsim.config import load_config
    from zdcsim.data import get_train_test_data, make_loaders
    from zdcsim.models import build_moe
    from zdcsim.train.evaluate import build_evaluator
    from zdcsim.train.loop import train

    cfg = load_config(overrides=BASE + [f"train.seed={seed}"] + extra)
    t0 = time.time()
    split = get_train_test_data(cfg)
    history, state = train(cfg, split=split, return_state=True)
    wall = time.time() - t0

    ws_series = [(h["epoch"], h["ws_mean"]) for h in history if "ws_mean" in h]
    best_epoch, best_ws = min(ws_series, key=lambda t: t[1])

    # EMA-vs-raw serving-weights eval: same split/epoch/keys, only the
    # generator weights differ.
    modules = build_moe(cfg)
    evaluator = build_evaluator(modules, cfg)
    _, test_loader = make_loaders(cfg, split)
    key = jax.random.PRNGKey(1234)
    m_raw = evaluator(state, test_loader.arrays, 60, key)
    state_ema = state.replace(gen=state.gen.replace(params=state.ema_gen_params))
    m_ema = evaluator(state_ema, test_loader.arrays, 60, key)

    emit({
        "arm": tag, "seed": seed, "family": "proton",
        "ws_best": float(best_ws), "ws_best_epoch": int(best_epoch),
        "ws_final": float(ws_series[-1][1]),
        "ws_raw": float(m_raw["ws_mean"]), "ws_raw_rel": float(m_raw["ws_mean_rel"]),
        "ws_ema": float(m_ema["ws_mean"]), "ws_ema_rel": float(m_ema["ws_mean_rel"]),
        "ws_real_floor": float(m_raw["ws_real_floor"]),
        "wall_s": round(wall, 1),
        "ws_series": [[int(e), round(float(w), 1)] for e, w in ws_series],
    })


def run_neutron(seed=7):
    import numpy as np
    from zdcsim.config import load_config
    from zdcsim.train.loop import train

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "zdcsim", "config", "neutron.yaml"
    )
    cfg = load_config(
        cfg_path,
        overrides=BASE + [f"train.seed={seed}", "model.norm=batch"],
    )
    t0 = time.time()
    history = train(cfg)
    wall = time.time() - t0
    ws_series = [(h["epoch"], h["ws_mean"]) for h in history if "ws_mean" in h]
    gl = [h.get("gen_loss") for h in history]
    dl = [h.get("disc_loss") for h in history]
    emit({
        "arm": "neutron_masked_bn", "seed": seed, "family": "neutron",
        "gen_loss_epoch0": float(gl[0]), "gen_loss_final": float(gl[-1]),
        "disc_loss_epoch0": float(dl[0]), "disc_loss_final": float(dl[-1]),
        "disc_loss_min": float(np.min(dl)),
        "ws_best": float(min(w for _, w in ws_series)),
        "ws_final": float(ws_series[-1][1]),
        "wall_s": round(wall, 1),
        "ws_series": [[int(e), round(float(w), 1)] for e, w in ws_series],
        "gen_loss_series": [round(float(g), 3) for g in gl],
    })


def main():
    # Masked-BN neutron A/B first (validates today's change early).
    run_neutron(seed=7)
    for seed in (7, 21):
        run_proton("base", seed, [
            "model.generator.sdi_pairwise_quirk=false",
            "model.router.differentiable_gan_term=true",
        ])
    for seed in (7, 21):
        run_proton("sdi_quirk", seed, [
            "model.generator.sdi_pairwise_quirk=true",
            "model.router.differentiable_gan_term=true",
        ])
    for seed in (7, 21):
        run_proton("const_gan_term", seed, [
            "model.generator.sdi_pairwise_quirk=false",
            "model.router.differentiable_gan_term=false",
        ])
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
