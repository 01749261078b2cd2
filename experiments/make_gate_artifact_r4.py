"""Extract the fidelity gate's serving weights into the COMMITTED artifact
(VERDICT r3 #2: the gate must survive rounds).

Reads a trained run-dir checkpoint, packs the EMA generator + router params
(float16, a few MB) into ``artifacts/gate/gate_serving_weights.npz``, and
verifies the split-determinism assumption the artifact path relies on: a
fresh no-resume data prep at the same seed must produce the same test
indices the run dir saved (the whole prep stream is seeded — this asserts
it stays that way).

Usage: python experiments/make_gate_artifact_r4.py [run_dir] [epoch]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, "/root/repo")

OUT = "artifacts/gate/gate_serving_weights.npz"


def main():
    from zdcsim.utils.platform import force_cpu

    force_cpu()  # weight extraction is host work; no chip needed
    import jax
    import numpy as np

    from zdcsim.config import load_config
    from zdcsim.data.dataset import get_train_test_data
    from zdcsim.models import build_moe
    from zdcsim.train.checkpoint import restore_checkpoint
    from zdcsim.train.state import init_state
    from zdcsim.utils.artifact import save_serving_artifact
    from zdcsim.utils.io import DIR_INFO, DIR_MODELS, load_train_test_indices

    if len(sys.argv) > 1:
        run_dir = sys.argv[1]
    else:
        runs = [d for d in glob.glob("experiments/fidelity_ckpt_*") if os.path.isdir(d)]
        run_dir = max(runs, key=os.path.getmtime)
    if len(sys.argv) > 2:
        epoch = int(sys.argv[2])
    else:
        import re

        models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=run_dir)
        epoch = max(
            int(m.group(1))
            for p in glob.glob(os.path.join(models, "state_epoch_*"))
            if (m := re.search(r"state_epoch_(\d+)$", p))
        )

    base_overrides = [
        "dataset.synthetic=true", "dataset.synthetic_n_samples=25600",
        "train.batch_size=512", "model.n_experts=3", "train.seed=7",
    ]
    cfg = load_config(overrides=base_overrides)
    modules = build_moe(cfg)
    template = init_state(modules, cfg, jax.random.PRNGKey(0), batch_size=2)
    state = restore_checkpoint(
        DIR_MODELS.format(EXPERIMENT_DIR_NAME=run_dir), epoch, template
    )

    # Split-determinism check: fresh no-resume prep at seed 7 must reproduce
    # the run dir's saved test membership.
    split = get_train_test_data(load_config(overrides=base_overrides))
    _, saved_test = load_train_test_indices(
        DIR_INFO.format(EXPERIMENT_DIR_NAME=run_dir)
    )
    if not np.array_equal(np.asarray(split.test_indices), np.asarray(saved_test)):
        raise SystemExit(
            "FRESH SPLIT != RUN-DIR SPLIT: the artifact fallback would "
            "evaluate on different test membership; fix the seed plumbing "
            "before committing an artifact"
        )
    print(f"split determinism OK ({len(saved_test)} test rows)", flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    path = save_serving_artifact(
        OUT,
        state.ema_gen_params,
        state.gen.stats,
        state.router.params,
        meta={
            "epoch": epoch,
            "weights": "ema",
            "source": f"{run_dir}@{epoch}",
            "recipe": " ".join(base_overrides),
        },
    )
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
