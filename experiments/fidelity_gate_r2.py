"""int8/bf16/f32 serving fidelity gate on a trained checkpoint.

For each engine precision: generate the test split with the production bulk
path, compute 5-channel W1 vs the real GEANT4-like showers, and report
ws_mean (+/- over noise draws), ws_mean_rel (scale-normalized) and the
real-vs-real finite-sample floor. Decides whether int8 serving is
physics-grade (BENCH_LOG.md records the verdict).

Usage: python experiments/fidelity_gate_r2.py <experiment_dir> <epoch>
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from zdcsim.config import load_config  # noqa: E402
from zdcsim.data import get_train_test_data, make_loaders  # noqa: E402
from zdcsim.inference import FastSim  # noqa: E402
from zdcsim.models import build_moe  # noqa: E402
from zdcsim.ops.channels import sum_channels  # noqa: E402
from zdcsim.ops.ws import wasserstein_per_channel  # noqa: E402
from zdcsim.utils.io import DIR_MODELS  # noqa: E402

N_DRAWS = 3


def main():
    exp_dir, epoch = sys.argv[1], int(sys.argv[2])
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
    half = n // 2
    floor = float(jnp.mean(
        wasserstein_per_channel(ch_real[:half], ch_real[half: 2 * half])))
    scale = float(jnp.mean(ch_real))
    print(f"test showers: {n}; photon-scale {scale:,.1f}; "
          f"real-vs-real floor W1 = {floor:,.2f} (rel {floor/scale:.4f})", flush=True)

    ckpt_models = DIR_MODELS.format(EXPERIMENT_DIR_NAME=exp_dir)
    cfg_small = load_config(overrides=["model.n_experts=3"])
    build_moe(cfg_small)  # warm registry

    for precision in ("f32", "bf16", "int8"):
        engine = FastSim.from_checkpoint(
            cfg, ckpt_models, epoch, use_ema=False,
            batch_size=2048, precision=precision,
        )
        ws, ws_half = [], []
        for d in range(N_DRAWS):
            showers = engine.simulate_bulk(cond, jax.random.PRNGKey(100 + d))
            ch_gen = sum_channels(jnp.asarray(showers))
            ws.append(float(jnp.mean(wasserstein_per_channel(ch_real, ch_gen))))
            # matched-size comparison vs the half-split floor (W1 has
            # finite-sample bias ~ 1/sqrt(N); compare like with like)
            ws_half.append(float(jnp.mean(
                wasserstein_per_channel(ch_real[:half], ch_gen[half: 2 * half]))))
        ws, ws_half = np.asarray(ws), np.asarray(ws_half)
        print(f"{precision:5s} ws_mean {ws.mean():10,.2f} +- {ws.std():6.2f} "
              f"(rel {ws.mean()/scale:.4f}); matched-N vs floor: "
              f"{ws_half.mean():,.2f} = x{ws_half.mean()/max(floor,1e-9):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
