"""Command-line entrypoint.

Parity with the reference launcher (``/root/reference/cli.py``):
``python cli.py --config <yaml> --override k=v ...`` loads the layered
config, builds the data pipeline, and runs training. Additional
subcommand-style flags cover the capabilities the reference keeps in
notebooks/scripts: ``--bench`` (fast-sim throughput), ``--simulate``
(batch inference to .npz); offline data prep is
``python -m zdcsim.data.prep``.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import List, Optional

log = logging.getLogger("zdcsim")


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="zdcsim", description="TPU-native ZDC fast simulation")
    p.add_argument("--config", type=str, default=None, help="YAML config (merged over defaults)")
    p.add_argument(
        "--override", nargs="*", default=[], metavar="KEY=VALUE",
        help="dotlist overrides, e.g. model.n_experts=5 train.epochs=10",
    )
    p.add_argument("--bench", action="store_true", help="run the fast-sim throughput benchmark")
    p.add_argument("--simulate", type=str, default=None, metavar="OUT.npz",
                   help="run fast-sim inference on the test split and save showers")
    p.add_argument("--eval", action="store_true",
                   help="run the WS evaluation on the test split (optionally from "
                        "--checkpoint-epoch) and print the metrics as JSON")
    p.add_argument("--checkpoint-epoch", type=int, default=None,
                   help="with --bench/--simulate: load this checkpoint epoch")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise on NaN/Inf in any jitted computation (the analog of the "
                        "reference's torch.autograd.set_detect_anomaly, cli.py:27-34)")
    return p.parse_args(argv)


def _inject_checkpoint_epoch(overrides: List[str], checkpoint_epoch: Optional[int]) -> List[str]:
    """--bench/--eval/--simulate from a checkpoint must reuse the PERSISTED
    train/test split of that run, not regenerate it from the seed —
    regeneration would silently change test membership (train/test leakage in
    the reported WS) if seed or data options differ from the training
    invocation. Mapping --checkpoint-epoch onto train.epoch_to_load (before
    load_config, so the both-or-neither resume validation sees a consistent
    pair) routes get_train_test_data through the saved-index load path
    (data/dataset.py)."""
    out = list(overrides)
    if checkpoint_epoch is not None and not any(
        o.startswith("train.epoch_to_load=") for o in out
    ):
        out.append(f"train.epoch_to_load={checkpoint_epoch}")
    return out


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    args = parse_args(argv)
    if args.cpu:
        from zdcsim.utils.platform import force_cpu

        force_cpu()

    from zdcsim.config import load_config

    cfg = load_config(args.config, _inject_checkpoint_epoch(args.override, args.checkpoint_epoch))

    import jax

    from zdcsim.utils.platform import enable_compile_cache

    # Remote-TPU compiles over the axon tunnel cost 1-4 min each and don't
    # survive the process otherwise; bench/fidelity already do this.
    enable_compile_cache()

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    log.info("JAX devices: %s", jax.devices())

    if args.bench:
        from zdcsim.inference import FastSim
        from zdcsim.models import build_moe
        from zdcsim.train.state import init_state_jit

        modules = build_moe(cfg)
        if args.checkpoint_epoch is not None:
            from zdcsim.utils.io import DIR_MODELS

            if cfg.train.checkpoint_experiment_dir is None:
                raise SystemExit("--checkpoint-epoch requires train.checkpoint_experiment_dir")
            ckpt_models = DIR_MODELS.format(
                EXPERIMENT_DIR_NAME=cfg.train.checkpoint_experiment_dir
            )
            engine = FastSim.from_checkpoint(cfg, ckpt_models, args.checkpoint_epoch)
        else:
            state = init_state_jit(modules, cfg, jax.random.PRNGKey(int(cfg.train.seed)))
            engine = FastSim.from_state(modules, state)
        stats = engine.throughput()
        print(json.dumps(stats))
        return 0

    if args.eval:
        from zdcsim.data import get_train_test_data, make_loaders
        from zdcsim.models import build_moe
        from zdcsim.train.evaluate import build_evaluator
        from zdcsim.train.state import init_state_jit
        from zdcsim.utils.io import append_experiment_dir_to_cfg

        append_experiment_dir_to_cfg(cfg)
        split = get_train_test_data(cfg)
        modules = build_moe(cfg)
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(int(cfg.train.seed)))
        if args.checkpoint_epoch is not None:
            from zdcsim.train.checkpoint import restore_checkpoint
            from zdcsim.utils.io import DIR_MODELS

            if cfg.train.checkpoint_experiment_dir is None:
                raise SystemExit("--checkpoint-epoch requires train.checkpoint_experiment_dir")
            ckpt_models = DIR_MODELS.format(
                EXPERIMENT_DIR_NAME=cfg.train.checkpoint_experiment_dir
            )
            state = restore_checkpoint(ckpt_models, args.checkpoint_epoch, state)
        _, test_loader = make_loaders(cfg, split)
        evaluator = build_evaluator(modules, cfg)
        metrics = evaluator(
            state, test_loader.arrays, epoch=args.checkpoint_epoch or 0,
            key=jax.random.PRNGKey(0),
        )
        print(json.dumps({
            k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in metrics.items()
        }))
        return 0

    if args.simulate is not None:
        import numpy as np

        from zdcsim.data import get_train_test_data
        from zdcsim.inference import FastSim
        from zdcsim.models import build_moe
        from zdcsim.train.state import init_state_jit
        from zdcsim.utils.io import append_experiment_dir_to_cfg

        append_experiment_dir_to_cfg(cfg)
        split = get_train_test_data(cfg)
        modules = build_moe(cfg)
        state = init_state_jit(modules, cfg, jax.random.PRNGKey(int(cfg.train.seed)))
        if args.checkpoint_epoch is not None:
            from zdcsim.train.checkpoint import restore_checkpoint
            from zdcsim.utils.io import DIR_MODELS

            if cfg.train.checkpoint_experiment_dir is None:
                raise SystemExit("--checkpoint-epoch requires train.checkpoint_experiment_dir")
            ckpt_models = DIR_MODELS.format(
                EXPERIMENT_DIR_NAME=cfg.train.checkpoint_experiment_dir
            )
            state = restore_checkpoint(ckpt_models, args.checkpoint_epoch, state)
        # Tiled-switch dispatch: single-expert FLOPs and far lower memory
        # than dense all-expert decode (8192-dense OOMs a 16 GB chip).
        engine = FastSim.from_state(
            modules, state, scaler_cond=split.scaler_cond, batch_size=4096
        )
        showers, experts = engine.simulate_switch(
            split.y_test, jax.random.PRNGKey(0), return_experts=True
        )
        np.savez(args.simulate, showers=np.asarray(showers), experts=np.asarray(experts))
        log.info("Wrote %d showers to %s", showers.shape[0], args.simulate)
        return 0

    from zdcsim.train.loop import train

    try:
        history = train(cfg)
    except Exception:
        log.exception("Training failed")
        return 1
    if history:
        last = history[-1]
        log.info("Final epoch metrics: %s",
                 {k: v for k, v in last.items() if not k.startswith("_")})
    return 0


if __name__ == "__main__":
    sys.exit(main())
