"""Feature scalers (numpy), drop-in equivalents of the sklearn scalers the
reference uses (expertsim/utils/data_transformations.py:168-199) without the
sklearn dependency, and serializable to the reference's text format
(zdcsim.utils.io.save_scales)."""

from __future__ import annotations

from typing import Optional

import numpy as np


class StandardScaler:
    """Zero-mean / unit-variance scaler (population std, like sklearn)."""

    def __init__(self):
        self.mean_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, np.float64)
        self.mean_ = x.mean(axis=0)
        std = x.std(axis=0)
        # sklearn maps zero variance to scale 1 so constant columns pass through.
        self.scale_ = np.where(std == 0.0, 1.0, std)
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return ((np.asarray(x, np.float64) - self.mean_) / self.scale_).astype(np.float32)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, np.float64) * self.scale_ + self.mean_).astype(np.float32)


class MinMaxScaler:
    """Scale features to [0, 1] per column (sklearn default range)."""

    def __init__(self):
        self.min_: Optional[np.ndarray] = None
        self.scale_: Optional[np.ndarray] = None  # 1 / (max - min)

    def fit(self, x: np.ndarray) -> "MinMaxScaler":
        x = np.asarray(x, np.float64)
        lo = x.min(axis=0)
        hi = x.max(axis=0)
        rng = hi - lo
        self.min_ = lo
        self.scale_ = np.where(rng == 0.0, 1.0, 1.0 / np.where(rng == 0.0, 1.0, rng))
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return ((np.asarray(x, np.float64) - self.min_) * self.scale_).astype(np.float32)

    def fit_transform(self, x: np.ndarray) -> np.ndarray:
        return self.fit(x).transform(x)

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, np.float64) / self.scale_ + self.min_).astype(np.float32)
