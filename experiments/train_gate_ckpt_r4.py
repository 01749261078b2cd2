"""Resume the round-3 fidelity-gate checkpoint to 150 epochs (VERDICT r3 #1).

The out-of-the-box gate FAILS at 2.149x floor on the 60-epoch
fidelity_ckpt_r3 checkpoint — a training-length artifact (the 1.5x
criterion was calibrated on a 150-epoch run, BENCH_LOG "Round-3
closeout"). Resume from state_epoch_59 and train epochs 59..149 with
the in-loop saver disabled (per-epoch Orbax saves cost ~160 s/epoch of
D2H over the axon tunnel), then write ONE final-state checkpoint that
fidelity.py's fidelity_ckpt_* glob resolves.

Usage: python experiments/train_gate_ckpt_r4.py [resume_dir] [epochs]
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _newest_gate_run() -> str:
    runs = [
        d for d in glob.glob("experiments/fidelity_ckpt_r3_*") if os.path.isdir(d)
    ]
    if not runs:
        raise SystemExit(
            "no fidelity_ckpt_r3_* run on disk; retrain from scratch with "
            "`python experiments/train_gate_ckpt_r3.py 150` instead"
        )
    return max(runs, key=os.path.getmtime)


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

    resume_dir = sys.argv[1] if len(sys.argv) > 1 else _newest_gate_run()
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        "train.precision=bf16", f"train.epochs={epochs}",
        "train.ws_threshold_model_save=0",  # never save in-loop (slow D2H)
        "train.save_experiment_data=true",  # dir + scalers + split indices
        f"train.checkpoint_experiment_dir={resume_dir}",
        "train.epoch_to_load=59",
        "config.run_name=fidelity_ckpt_r4",
    ])
    append_experiment_dir_to_cfg(cfg)
    split = get_train_test_data(cfg)  # reloads the r3 run's split indices
    t0 = time.time()
    history, state = train(cfg, split=split, return_state=True)
    best = min(h["ws_mean"] for h in history if "ws_mean" in h)
    print(f"trained to epoch {epochs - 1} in {time.time()-t0:.0f}s; "
          f"best ws_mean {best:.1f}", flush=True)
    dir_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=cfg.config.experiment_dir)
    path = save_checkpoint(dir_models, epochs - 1, state)
    print(f"saved final state: {path}", flush=True)


if __name__ == "__main__":
    main()
