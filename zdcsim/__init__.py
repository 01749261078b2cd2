"""zdcsim — TPU-native fast simulation for the ALICE Zero Degree Calorimeter.

A from-scratch JAX/XLA/Flax/Pallas framework with the capability surface of
the reference PyTorch research code
``patrick-bedkowski/Generative-DNN-for-Physics-Simulations-CERN``:
a mixture-of-experts conditional GAN (gumbel-softmax router over particle
kinematics, per-expert generator/discriminator/aux-regressor stacks) that
synthesizes 56x30 proton and 44x44 neutron ZDC shower images, trained with
SDI-GAN diversity, photon-sum intensity, and auxiliary-coordinate losses, and
evaluated by 5-channel Wasserstein distance against GEANT4.

Subpackages
-----------
- ``zdcsim.config``     YAML + dotlist config system
- ``zdcsim.data``       dataset ingestion, prep (notebook-equivalent), loaders
- ``zdcsim.models``     Flax modules: generators, discriminators, aux regs, routers
- ``zdcsim.ops``        losses, channel sums, Wasserstein metrics, Pallas kernels
- ``zdcsim.train``      train states, jitted train step, loop, hooks, checkpointing
- ``zdcsim.parallel``   device mesh and shard_map data/expert parallelism
- ``zdcsim.inference``  compiled sample->route->decode->expm1 fast-sim engine
- ``zdcsim.eval``       physics metrics and diagnostic plots
"""

__version__ = "0.1.0"
