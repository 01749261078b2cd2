"""Committed serving-weight artifacts — the fidelity gate's durable form.

Full Orbax train states (optimizer moments, discriminator, aux-reg — ~300
arrays) are too large to commit, and the gitignored ``experiments/`` dir
does not survive build rounds, which already cost one trained gate
checkpoint (BENCH_LOG "Round-3 closeout"). What the fidelity gate actually
needs is only the SERVING weights: the (EMA) generator param tree, its
non-param stats, and the router params — a few MB at float16 for these
CNNs. This module packs exactly that into one ``.npz`` that lives in
``artifacts/`` (committed), so ``python fidelity.py`` reproduces the
headline fidelity number on a fresh clone with zero retraining.

Storage codec: float leaves above ``INT8_MIN_SIZE`` elements are stored
int8 with per-output-channel float16 scales (scale over all axes except
the leading expert axis and the trailing channel axis — the same
per-cout granularity the int8 serving path quantizes weights at,
proton_fast._quant_per_cout); smaller leaves are float16. This matters
because the proton generator is MLP-dominated (Dense_1 is 256x92160 —
~92% of all params): float16 alone is a 146 MB artifact, int8 halves it.
The gate re-measures fidelity THROUGH the artifact path (fidelity.py
falls back to it), so the codec is covered by the same 1.5x-floor
criterion as everything else. Non-float leaves (ints, bools) are stored
as-is.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict, Tuple

import numpy as np

_GROUPS = ("gen_params", "gen_stats", "router_params")
_META_PREFIX = "__meta__:"
_SCALE_SUFFIX = "::scale"
_SEP = "|"  # flax param names ('Dense_0', 'kernel', ...) never contain it
INT8_MIN_SIZE = 65536  # float leaves at/above this element count go int8


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, Mapping):  # dict or flax FrozenDict
        for k, v in tree.items():
            if _SEP in str(k):
                raise ValueError(f"key {k!r} contains reserved separator {_SEP!r}")
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
        return out
    out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_serving_artifact(
    path: str,
    gen_params: Any,
    gen_stats: Any,
    router_params: Any,
    meta: Dict[str, Any] | None = None,
    dtype=np.float16,
) -> str:
    """Pack serving weights into one compressed ``.npz``.

    ``meta`` values are stored as 0-d string arrays under ``__meta__:`` keys
    (e.g. epochs trained, the checkpoint the weights came from, the save-time
    ws_mean) so the gate can report provenance.
    """
    flat: Dict[str, np.ndarray] = {}
    for group, tree in zip(_GROUPS, (gen_params, gen_stats, router_params)):
        for k, v in _flatten(tree, f"{group}{_SEP}").items():
            if np.issubdtype(v.dtype, np.floating):
                if v.size >= INT8_MIN_SIZE and v.ndim >= 2:
                    # per-output-channel int8: scale over every axis except
                    # the leading (expert) and trailing (channel) axes
                    reduce_axes = tuple(range(0 if v.ndim == 2 else 1, v.ndim - 1))
                    amax = np.max(np.abs(v), axis=reduce_axes, keepdims=True)
                    scale = (amax / 127.0 + 1e-12).astype(np.float32)
                    q = np.clip(np.rint(v / scale), -127, 127).astype(np.int8)
                    flat[k] = q
                    flat[f"{k}{_SCALE_SUFFIX}"] = scale.astype(np.float16)
                    continue
                v = v.astype(dtype)
            flat[k] = v
    for k, v in (meta or {}).items():
        flat[f"{_META_PREFIX}{k}"] = np.asarray(str(v))
    np.savez_compressed(path, **flat)
    return path


def load_serving_artifact(path: str) -> Tuple[Any, Any, Any, Dict[str, str]]:
    """Returns ``(gen_params, gen_stats, router_params, meta)`` with float
    leaves upcast to float32 (serving casts to its own compute dtype)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = {
        k[len(_META_PREFIX):]: str(v)
        for k, v in flat.items() if k.startswith(_META_PREFIX)
    }
    groups: Dict[str, Dict[str, np.ndarray]] = {g: {} for g in _GROUPS}
    for key, value in flat.items():
        if key.startswith(_META_PREFIX) or key.endswith(_SCALE_SUFFIX):
            continue
        group, _, rest = key.partition(_SEP)
        if value.dtype == np.int8:
            scale = flat[f"{key}{_SCALE_SUFFIX}"].astype(np.float32)
            value = value.astype(np.float32) * scale
        elif np.issubdtype(value.dtype, np.floating):
            value = value.astype(np.float32)
        groups[group][rest] = value
    trees = tuple(_unflatten(groups[g]) for g in _GROUPS)
    return trees[0], trees[1], trees[2], meta
