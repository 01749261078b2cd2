"""Configuration system for zdcsim.

Mirrors the capability surface of the reference's hydra/OmegaConf stack
(reference: cli.py:58-97, expertsim/config/default.yaml) without depending on
hydra: a YAML file is loaded into an attribute-accessible tree, dotlist
overrides (``model.n_experts=5``) are applied on top, and — like the
reference, which runs with ``OmegaConf.set_struct(False)`` — derived keys can
be injected at runtime (``cfg.photon_sum_min``, ``cfg.data_cond_names``, ...).

Unlike the reference, missing keys raise ``AttributeError`` with the full
dotted path instead of silently resolving to ``None``; the handful of keys the
reference reads but never defines (``limit_samples``, ``batch_size_aggregate``)
are declared explicitly in ``default.yaml``.
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Dict, Iterable, List, Optional

import yaml

_DEFAULT_CONFIG_PATH = os.path.join(os.path.dirname(__file__), "default.yaml")


class ConfigNode:
    """Attribute-accessible nested config tree (an OmegaConf-lite).

    Supports ``cfg.model.router.tau_start`` style access, item access,
    runtime injection of new keys, deep-merge and dotlist overrides.
    """

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = _wrap(v)

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._data[name]
        except KeyError:
            raise AttributeError(f"Config key not found: '{name}'") from None

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self._data[name] = _wrap(value)

    # -- mapping protocol ----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self):
        return iter(self._data)

    def __eq__(self, other) -> bool:
        if isinstance(other, ConfigNode):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self._data:
            self._data[key] = _wrap(default)
        return self._data[key]

    # -- utilities ------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else copy.deepcopy(v)
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def copy(self) -> "ConfigNode":
        return ConfigNode(self.to_dict())

    def merge(self, other: "ConfigNode | Dict[str, Any]") -> None:
        """Deep-merge ``other`` into this tree (other wins)."""
        items = other.items() if isinstance(other, (ConfigNode, dict)) else []
        for k, v in items:
            if (
                k in self._data
                and isinstance(self._data[k], ConfigNode)
                and isinstance(v, (ConfigNode, dict))
            ):
                self._data[k].merge(v)
            else:
                self._data[k] = _wrap(v)

    def select(self, dotted: str, default: Any = ...) -> Any:
        """Resolve a dotted path like ``model.router.tau_start``."""
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, ConfigNode) and part in node:
                node = node[part]
            elif default is not ...:
                return default
            else:
                raise KeyError(f"Config path not found: '{dotted}'")
        return node

    def update_dotted(self, dotted: str, value: Any) -> None:
        """Set a dotted path, creating intermediate nodes as needed."""
        parts = dotted.split(".")
        node: ConfigNode = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], ConfigNode):
                node[part] = ConfigNode()
            node = node[part]
        node[parts[-1]] = value

    def __repr__(self) -> str:
        return f"ConfigNode({self.to_dict()!r})"


def _wrap(value: Any) -> Any:
    if isinstance(value, dict):
        return ConfigNode(value)
    if isinstance(value, ConfigNode):
        return value
    return value


def _parse_override_value(raw: str) -> Any:
    """Parse a CLI override value using YAML scalar rules.

    ``"null"``/``"None"`` -> None, ``"1e-4"`` -> float, ``"[56,30]"`` -> list.
    Notably ``1-6`` stays a string under YAML — the reference config contains
    exactly this typo for ``router.diff_strength`` (default.yaml:27); see
    ``normalize_legacy_values``.
    """
    if raw == "None":
        return None
    try:
        val = yaml.safe_load(io.StringIO(raw))
    except yaml.YAMLError:
        return raw
    if isinstance(val, str):
        # YAML 1.1 rejects floats like "5e-5" (no dot in mantissa); accept them.
        try:
            return float(val)
        except ValueError:
            return val
    return val


def apply_overrides(cfg: ConfigNode, overrides: Iterable[str]) -> ConfigNode:
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"Override must look like key=value, got: '{item}'")
        key, _, raw = item.partition("=")
        cfg.update_dotted(key.strip(), _parse_override_value(raw.strip()))
    return cfg


def normalize_legacy_values(cfg: ConfigNode) -> ConfigNode:
    """Fix up values the reference config encodes incorrectly.

    The reference's ``router.diff_strength: 1-6`` parses as the *string*
    ``"1-6"`` (expertsim/config/default.yaml:27), which would crash its own
    loss (tensor * str). We interpret such strings as the scientific notation
    they were meant to be (``1e-6``) and coerce numerics stored as strings.
    """
    router = cfg.model.router
    for key in (
        "ed_strength",
        "gan_strength",
        "diff_strength",
        "util_strength",
        "alb_strength",
    ):
        val = router.get(key)
        if isinstance(val, str):
            fixed = val.replace("-", "e-") if "e" not in val.lower() else val
            try:
                router[key] = float(fixed)
            except ValueError:
                raise ValueError(
                    f"Cannot interpret router.{key}={val!r} as a float"
                ) from None
    return cfg


def load_config(
    config_path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> ConfigNode:
    """Load the default config, optionally merge a user YAML, apply overrides.

    Mirrors the reference entrypoint behavior (cli.py:58-97): defaults come
    from ``zdcsim/config/default.yaml``; a user config deep-merges on top;
    ``key=value`` dotlist overrides apply last.
    """
    with open(_DEFAULT_CONFIG_PATH) as f:
        cfg = ConfigNode(yaml.safe_load(f))
    if config_path is not None:
        with open(config_path) as f:
            user = yaml.safe_load(f) or {}
        cfg.merge(user)
    apply_overrides(cfg, overrides or [])
    normalize_legacy_values(cfg)
    _validate(cfg)
    return cfg


def _validate(cfg: ConfigNode) -> None:
    if cfg.dataset.zdc_type not in ("proton", "neutron"):
        raise ValueError(f"dataset.zdc_type must be proton|neutron, got {cfg.dataset.zdc_type}")
    if cfg.model.architecture not in ("proton", "neutron"):
        raise ValueError(f"model.architecture must be proton|neutron, got {cfg.model.architecture}")
    if int(cfg.model.n_experts) < 1:
        raise ValueError("model.n_experts must be >= 1")
    shape = tuple(cfg.dataset.input_image_shape)
    if len(shape) != 2:
        raise ValueError("dataset.input_image_shape must be [H, W]")
    # Both flags must be set together for resume (reference raises the same way,
    # expertsim/utils/data_transformations.py:221-222).
    ckpt, ep = cfg.train.checkpoint_experiment_dir, cfg.train.epoch_to_load
    if (ckpt is None) != (ep is None):
        raise ValueError("Set both train.checkpoint_experiment_dir and train.epoch_to_load, or neither")
