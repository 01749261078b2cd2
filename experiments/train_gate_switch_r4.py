"""Reference-default-scale training with the SWITCH throughput recipe.

The dense reference-default-scale run (B=512 x 250 epochs x E=3, 67 min,
gate 1.116x floor — BENCH_LOG "reference-default-scale run") demonstrated
the framework at the reference's own training length. This run is the
same protocol under the measured throughput recipe
(train.dispatch=switch + constant router GAN term, BENCH_LOG round-3
training study): single-expert-FLOPs dispatch end to end at scale —
the recipe's fidelity was previously validated only at 60 epochs
(seeds 7/21 A/B).

Deliverables: wall-clock vs the dense 67-min run, and the fidelity gate
(fidelity.py protocol) on the produced checkpoint.

Usage: python experiments/train_gate_switch_r4.py [epochs] [run_name]
                                                  [tile] [remat]
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

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    run_name = sys.argv[2] if len(sys.argv) > 2 else "switch_ref_scale_r4"
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    remat = sys.argv[4] if len(sys.argv) > 4 else "true"
    cfg = load_config(overrides=[
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
        "train.precision=bf16", f"train.epochs={epochs}",
        # the throughput recipe (ROADMAP "Performance (training)"):
        "train.dispatch=switch", f"train.dispatch_tile={tile}",
        f"train.dispatch_remat={remat}",
        "model.router.differentiable_gan_term=false",
        "train.ws_threshold_model_save=0",  # never save in-loop (slow D2H)
        "train.save_experiment_data=true",
        f"config.run_name={run_name}",
    ])
    append_experiment_dir_to_cfg(cfg)
    split = get_train_test_data(cfg)
    t0 = time.time()
    history, state = train(cfg, split=split, return_state=True)
    wall = time.time() - t0
    best = min(h["ws_mean"] for h in history if "ws_mean" in h)
    print(f"trained {epochs} epochs in {wall:.0f}s ({wall/60:.1f} min); "
          f"best ws_mean {best:.1f}", flush=True)
    dir_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=cfg.config.experiment_dir)
    path = save_checkpoint(dir_models, epochs - 1, state)
    print(f"saved final state: {path}", flush=True)


if __name__ == "__main__":
    main()
