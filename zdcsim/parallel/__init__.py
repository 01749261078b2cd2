"""Multi-chip parallelism: device mesh, data- and expert-parallel shardings.

The reference has no distributed training of any kind (SURVEY.md §2.7); this
subsystem is a new TPU-native capability. Strategy (scaling-book style): pick
a mesh, annotate shardings, let XLA's GSPMD partitioner insert the
collectives over ICI.

- **data axis**: the batch is sharded over ``data``; every loss in
  zdcsim.train.step is a full-batch mean/sum, so XLA lowers the gradient
  reduction to a single fused ``psum`` per backward — classic DP without any
  hand-written collective.
- **expert axis**: the stacked expert parameters (leading ``[E, ...]`` axis,
  zdcsim.models.stack_experts) shard over ``expert``; the dense
  all-experts-compute design makes EP a pure layout annotation — each device
  slice runs its experts' G/D/aux over the (data-sharded) batch, and the
  routed gather/mask reductions become cross-axis collectives XLA places on
  ICI.
"""

from zdcsim.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_state,
    state_shardings,
)
