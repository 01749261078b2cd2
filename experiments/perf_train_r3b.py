"""Remaining training-perf arms (perf_train_r3 died at the SWITCH arm's
HBM OOM — scan-under-grad stacked every chunk's activations; fixed by
checkpointing the chunk body, switch_dispatch.tiled_switch_apply(remat=)).

Already measured (perf_train_r3, E=3 B=512, 10-step chained):
  dense f32 806.5 ms/step (635 samples/s, 29% bf16 peak)
  dense bf16 401.9 ms/step (1,274 samples/s, 57% peak)
  dense bf16 + fast_generator 529.0 ms/step (968 samples/s — REJECTED)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from perf_train_r3 import bench_arm  # noqa: E402


def main():
    import jax
    print("devices:", jax.devices(), flush=True)
    B = 512
    base = [f"train.batch_size={B}", "model.n_experts=3",
            "model.router.differentiable_gan_term=false"]

    print(f"\n--- switch dispatch (remat chunks), E=3 B={B} ---", flush=True)
    t_bf16 = 0.4019  # measured in perf_train_r3
    t_sw = bench_arm("SWITCH bf16 tile=64",
                     base + ["train.precision=bf16", "train.dispatch=switch"], B)
    for tile in (128, 256):
        bench_arm(f"SWITCH bf16 tile={tile}",
                  base + ["train.precision=bf16", "train.dispatch=switch",
                          f"train.dispatch_tile={tile}"], B)
    print(f"\nswitch speedup vs dense bf16 (401.9 ms): {t_bf16/t_sw:.2f}x",
          flush=True)

    print("\n--- scaling arms ---", flush=True)
    bench_arm("dense bf16 E=1", ["train.batch_size=512", "model.n_experts=1",
                                 "train.precision=bf16"], 512)
    bench_arm("dense bf16 E=5 B=256 remat",
              ["train.batch_size=256", "model.n_experts=5",
               "train.precision=bf16", "train.remat=true",
               "model.router.differentiable_gan_term=false"], 256)
    bench_arm("SWITCH bf16 E=5 B=256",
              ["train.batch_size=256", "model.n_experts=5",
               "train.precision=bf16", "train.dispatch=switch",
               "model.router.differentiable_gan_term=false"], 256)

    print("\n--- dense with differentiable router GAN term (default) ---",
          flush=True)
    bench_arm("dense bf16 diff-gan", [f"train.batch_size={B}",
                                      "model.n_experts=3",
                                      "train.precision=bf16"], B)


if __name__ == "__main__":
    main()
