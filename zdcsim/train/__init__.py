"""Training subsystem: states, jitted train/eval steps, loop, hooks,
checkpointing."""

from zdcsim.train.state import (  # noqa: F401
    Component,
    MoETrainState,
    init_state,
    masked_expert_update,
)
from zdcsim.train.step import build_train_step  # noqa: F401
from zdcsim.train.evaluate import build_evaluator  # noqa: F401
from zdcsim.train.loop import train  # noqa: F401
