"""Data subsystem: ingestion, offline prep, scalers, device-resident loaders.

Covers the reference's data pipeline (expertsim/utils/data_transformations.py)
plus the three offline notebooks (SURVEY.md §2.6) as a programmatic prep
module, re-designed for TPU: the whole dataset lives in device HBM as static
arrays and per-epoch shuffling is a `jax.random.permutation` — no host-side
DataLoader workers in the hot path.
"""

from zdcsim.data.scalers import MinMaxScaler, StandardScaler  # noqa: F401
from zdcsim.data.dataset import (  # noqa: F401
    SplitArrays,
    get_dataset,
    get_train_test_data,
    transform_data_for_training,
)
from zdcsim.data.loader import DeviceLoader, make_loaders  # noqa: F401
from zdcsim.data.synthetic import make_synthetic_dataset  # noqa: F401
