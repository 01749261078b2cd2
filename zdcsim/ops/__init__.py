"""Pure compute ops: channel decomposition, Wasserstein metrics, GAN/MoE losses.

Everything here is a pure function of arrays — jittable, vmappable, and
shard_map-safe. Loss semantics match the reference implementations cited in
each docstring, re-expressed for static-shape masked computation (the
TPU-native replacement for the reference's variable-length per-expert
subsetting, expertsim/models/moe.py:121-207).
"""

from zdcsim.ops.channels import (  # noqa: F401
    get_channel_masks,
    channel_basis,
    sum_channels,
    sum_channels_np,
)
from zdcsim.ops.ws import wasserstein_1d, wasserstein_per_channel  # noqa: F401
from zdcsim.ops.losses import (  # noqa: F401
    masked_mean,
    masked_std,
    hinge_discriminator_loss,
    hinge_generator_loss,
    sdi_gan_regularization,
    intensity_regularization,
    log_cosh_loss,
    expert_utilization_entropy,
    expert_distribution_loss,
    differentiation_loss,
    adaptive_load_balancing_loss,
    tau_schedule,
    alb_annealing_weight,
)
from zdcsim.ops.routing import gumbel_softmax, straight_through_gates  # noqa: F401
