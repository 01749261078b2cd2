"""Train the fidelity-gate checkpoint with ONE end-of-run Orbax save.

Per-epoch checkpointing over the axon tunnel costs ~160 s/epoch of D2H
(295 arrays of full train state), turning the 18 s/epoch 60-epoch gate
run into 3+ hours — so train with the saver disabled
(ws_threshold_model_save=0 never fires) and save the final state once.
fidelity.py resolves the produced dir via its fidelity_ckpt_* glob.

Usage: python experiments/train_gate_ckpt_r3.py [epochs] [run_name]
(run_name defaults to fidelity_ckpt_r3 — the prefix fidelity.py globs;
pass e.g. ref_default_250 for the reference-default-scale evidence run.)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import logging

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    from zdcsim.utils.platform import enable_compile_cache

    enable_compile_cache()

    from zdcsim.config import load_config
    from zdcsim.data import get_train_test_data
    from zdcsim.train.checkpoint import save_checkpoint
    from zdcsim.train.loop import train
    from zdcsim.utils.io import DIR_MODELS, append_experiment_dir_to_cfg

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    run_name = sys.argv[2] if len(sys.argv) > 2 else "fidelity_ckpt_r3"
    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        "train.precision=bf16", f"train.epochs={epochs}",
        "train.ws_threshold_model_save=0",  # never save in-loop (slow D2H)
        "train.save_experiment_data=true",  # dir + scalers + split indices
        f"config.run_name={run_name}",
    ])
    # Stamp the timestamped experiments/ dir BEFORE prep: get_train_test_data
    # otherwise falls back to a bare run_name dir at the repo root for the
    # scaler/split-index saves, splitting the run's artifacts in two.
    append_experiment_dir_to_cfg(cfg)
    split = get_train_test_data(cfg)
    t0 = time.time()
    history, state = train(cfg, split=split, return_state=True)
    best = min(h["ws_mean"] for h in history if "ws_mean" in h)
    print(f"trained {epochs} epochs in {time.time()-t0:.0f}s; "
          f"best ws_mean {best:.1f}", flush=True)
    dir_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=cfg.config.experiment_dir)
    path = save_checkpoint(dir_models, epochs - 1, state)
    print(f"saved final state: {path}", flush=True)


if __name__ == "__main__":
    main()
