"""Switch-dispatch end-to-end fidelity confirmation (round 3).

The training study measured `train.dispatch=switch` at 1.36x dense
samples/s (E=3, T=128) with gradient-exact masked losses, and the
const_gan_term dense A/B measured the required constant router GAN term
as fidelity-neutral (fidelity_r3.jsonl). This run closes the loop: a full
60-epoch proton run with `dispatch=switch` + `differentiable_gan_term=false`
on chip, recorded under arm "switch_const" next to the dense arms.

If ws_ema lands in the dense const_gan_term band (~560-620), the
throughput recipe (switch + const term) is validated end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fidelity_studies_r3 import run_proton  # noqa: E402


def main():
    for seed in (7, 21):
        run_proton("switch_const", seed, [
            "model.router.differentiable_gan_term=false",
            "train.dispatch=switch",
        ])
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
