"""Device-resident batch loader.

The reference streams batches through host DataLoader workers with pinned
memory (data_transformations.py:275-281). On TPU the whole prepared dataset
(~3 GB at 400k x 44 x 44 float32) fits in HBM, so zdcsim uploads every array
once at startup and batching is an on-device gather — zero host↔device
traffic in the training hot loop. Per-epoch shuffling draws a fresh
permutation from a seeded host RNG (cheap, and keeps batch composition
reproducible and resumable by epoch index).

With a mesh, batches carry a ``NamedSharding`` over the data axis so the
jitted train step consumes them without resharding.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BatchDict = Dict[str, jnp.ndarray]


@jax.jit
def _gather(arrays, idx):
    return {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()}


class DeviceLoader:
    """Batches over a dict of equal-length arrays resident on device.

    The remainder batch is dropped (static shapes: every batch compiles to
    the same XLA program). ``shuffle=False`` iterates in storage order like
    the reference's loaders (which set shuffle=False too).
    """

    def __init__(
        self,
        arrays: Dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        stratify_labels: Optional[np.ndarray] = None,
    ):
        lengths = {k: len(v) for k, v in arrays.items()}
        if len(set(lengths.values())) != 1:
            raise ValueError(f"Array length mismatch: {lengths}")
        self.n = next(iter(lengths.values()))
        self.batch_size = int(batch_size)
        if self.n < self.batch_size:
            raise ValueError(f"batch_size {batch_size} exceeds dataset size {self.n}")
        self.shuffle = shuffle
        self.seed = seed
        self.sharding = sharding
        self.stratify_labels = (
            np.asarray(stratify_labels) if stratify_labels is not None else None
        )
        self.n_batches = self.n // self.batch_size
        self.arrays = {
            k: jax.device_put(jnp.asarray(v)) for k, v in arrays.items()
        }

    def epoch(self, epoch_idx: int = 0) -> Iterator[BatchDict]:
        """Iterate the batches of one epoch (deterministic in epoch_idx)."""
        if self.shuffle and self.stratify_labels is not None:
            rng = np.random.default_rng((self.seed, epoch_idx))
            order = stratified_batch_order(self.stratify_labels, self.batch_size, rng)
        elif self.shuffle:
            rng = np.random.default_rng((self.seed, epoch_idx))
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        for b in range(self.n_batches):
            idx = jnp.asarray(order[b * self.batch_size : (b + 1) * self.batch_size])
            batch = _gather(self.arrays, idx)
            if self.sharding is not None:
                batch = {k: jax.device_put(v, self.sharding) for k, v in batch.items()}
            yield batch

    def __len__(self) -> int:
        return self.n_batches


def stratified_batch_order(
    labels: np.ndarray, batch_size: int, rng: np.random.Generator
) -> np.ndarray:
    """Epoch ordering in which every batch approximates the global label mix.

    Functional equivalent of the reference's (unused) ``StratifiedBatchSampler``
    (expertsim/train/training_utils.py:270-288, StratifiedKFold over labels):
    shuffle within each label class, then interleave classes proportionally so
    each contiguous ``batch_size`` slice is stratified.
    """
    labels = np.asarray(labels).ravel()
    n = labels.shape[0]
    order = np.empty(n, dtype=np.int64)
    classes = np.unique(labels)
    # Proportional positions: sort a per-class uniform grid jointly.
    keys = np.empty(n, dtype=np.float64)
    for c in classes:
        members = rng.permutation(np.flatnonzero(labels == c))
        keys[members] = (np.arange(members.size) + rng.random(members.size)) / members.size
    order = np.argsort(keys, kind="stable")
    return order


def split_to_arrays(split, train: bool) -> Dict[str, np.ndarray]:
    """SplitArrays -> the batch dict consumed by the train/eval steps.

    The paired image ``x_2`` is loaded by the reference into every batch but
    never used by its train step (train/loop.py:171); zdcsim leaves it out of
    the device arrays to save HBM and bandwidth.
    """
    s = "train" if train else "test"
    g = lambda name: getattr(split, f"{name}_{s}")
    return {
        "real": g("x")[..., None],  # NHWC
        "cond": g("y"),
        "std": g("std"),
        "intensity": g("intensity"),
        "positions": g("positions"),
    }


def make_loaders(cfg, split, sharding=None) -> Tuple[DeviceLoader, DeviceLoader]:
    """Build train/test device loaders from a SplitArrays.

    ``train.stratified_batches: true`` orders each training epoch so every
    batch approximates the global expert-label mix (stratified_batch_order)
    — the working realization of the reference's dead-code
    StratifiedBatchSampler (expertsim/train/training_utils.py:270-288,
    constructed but never passed to a DataLoader there).
    """
    bs = int(cfg.train.batch_size)
    seed = int(cfg.train.seed)
    stratify = (
        split.expert_number_train
        if bool(cfg.train.get("stratified_batches", False)) else None
    )
    train_loader = DeviceLoader(
        split_to_arrays(split, True), bs, shuffle=True, seed=seed, sharding=sharding,
        stratify_labels=stratify,
    )
    test_bs = min(bs, split.x_test.shape[0])
    test_loader = DeviceLoader(
        split_to_arrays(split, False), test_bs, shuffle=False, seed=seed, sharding=sharding
    )
    return train_loader, test_loader
