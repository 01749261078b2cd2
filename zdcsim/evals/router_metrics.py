"""Router classification metrics vs precomputed expert labels.

Reference ``evaluate_router`` (expertsim/train/utils.py:299-310) compares the
router's argmax assignment against the dataset's ``expert_number`` column
with torchmetrics accuracy/precision/recall/F1. zdcsim computes the same
four macro-averaged metrics in numpy (no torchmetrics dependency).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def router_classification_metrics(
    predicted: np.ndarray, labels: np.ndarray, n_experts: int
) -> Dict[str, float]:
    predicted = np.asarray(predicted).astype(np.int64)
    labels = np.asarray(labels).astype(np.int64)
    accuracy = float((predicted == labels).mean()) if predicted.size else 0.0

    precisions, recalls, f1s = [], [], []
    for e in range(n_experts):
        tp = int(np.sum((predicted == e) & (labels == e)))
        fp = int(np.sum((predicted == e) & (labels != e)))
        fn = int(np.sum((predicted != e) & (labels == e)))
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        precisions.append(p)
        recalls.append(r)
        f1s.append(f)
    return {
        "accuracy": accuracy,
        "precision": float(np.mean(precisions)),
        "recall": float(np.mean(recalls)),
        "f1": float(np.mean(f1s)),
    }
