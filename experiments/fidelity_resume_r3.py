"""Resume the round-3 fidelity studies (the round-2→3 boundary killed the
original run after arms: neutron_masked_bn (pre dead-row fix, NaN@ep6),
base s7, base s21 — see fidelity_r3.jsonl).

Runs, in order:
  1. neutron norm=batch masked-BN 60-epoch A/B, seed 7 — RE-RUN after the
     dead-row zeroing fix (f03c08a); the previous record NaN'd at epoch ~6.
  2. sdi_quirk proton arm, seeds 7 & 21.
  3. const_gan_term proton arm, seeds 7 & 21.

Appends to experiments/fidelity_r3.jsonl like the original.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fidelity_studies_r3 import run_neutron, run_proton  # noqa: E402


def main():
    run_neutron(seed=7)
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
