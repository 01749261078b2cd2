"""Round-4 switch-dispatch training-step ladder.

Context (BENCH_LOG "Round-4 train-step budget"): after the one-hot-matmul
resize fix the DENSE step dropped 408 -> 358 ms; the SWITCH step (290 ms,
measured pre-fix) is conv-dominated once container double-counting is
removed (~175 ms conv fusions of ~288 ms wall). Two cheap levers were never
re-measured at the production point (B=512, T=128):

  1. ``train.dispatch_remat=false`` — the chunk-body checkpoint was added
     for an OOM measured at T=32 (perf_train_r3); it costs one extra
     forward of every dispatched module per grad. At T=128 the stacked
     scan activations may simply fit.
  2. the tile ladder, post-resize-fix (the resize is inside the generator,
     so the switch step's conv mix changed too).

Timing: N steps chained through the donated state, one scalar readback
(RTT amortized) — same harness as perf_train_r3.bench_arm.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from perf_train_r3 import bench_arm  # noqa: E402


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    B = 512
    base = [f"train.batch_size={B}", "model.n_experts=3"]
    sw = base + ["train.precision=bf16", "train.dispatch=switch",
                 "model.router.differentiable_gan_term=false"]

    t_dense = bench_arm("dense bf16 (post resize fix)",
                        base + ["train.precision=bf16"], B)

    arms = {}
    for tile in (64, 128, 256):
        for remat in ("true", "false"):
            name = f"switch T={tile} remat={remat}"
            try:
                arms[name] = bench_arm(
                    name, sw + [f"train.dispatch_tile={tile}",
                                f"train.dispatch_remat={remat}"], B)
            except Exception as e:  # noqa: BLE001 — OOM arms report and move on
                print(f"{name:40s} FAILED: {type(e).__name__}: {e}",
                      flush=True)

    best = min(arms, key=arms.get)
    print(f"\nbest: {best} {arms[best]*1e3:.1f} ms/step "
          f"= {t_dense/arms[best]:.2f}x dense ({t_dense*1e3:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
