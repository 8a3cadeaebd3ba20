"""Config system: TOML/YAML load, deep merge, dotted-path reflection.

Reimplements the reference's config machinery:
- TOML sections with dotted class paths resolved by `initialize_module`
  (train_base/utils.py:68-100)
- `merge_config` deep-merge with key validation (train_base/utils.py:129-179)
- the YAML `AttrDict` hparams path (utils/utils_base.py:49-67)

TOML is read with stdlib `tomllib` (the `toml` package is not in the image);
`dump_toml` provides the write path for config snapshots.
"""
from __future__ import annotations

import importlib
import tomllib
from copy import deepcopy
from functools import reduce
from typing import Any, Dict


def load_config(path: str) -> Dict[str, Any]:
    """Load a .toml or .yaml/.yml config file into a nested dict."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path, "rb") as f:
        return tomllib.load(f)


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    return str(v)


def dump_toml(config: Dict[str, Any], prefix: str = "") -> str:
    """Minimal TOML serializer (stdlib has no writer)."""
    lines = []
    scalars = {k: v for k, v in config.items() if not isinstance(v, dict)}
    tables = {k: v for k, v in config.items() if isinstance(v, dict)}
    for k, v in scalars.items():
        lines.append(f"{k} = {_toml_value(v)}")
    for k, v in tables.items():
        name = f"{prefix}.{k}" if prefix else k
        lines.append(f"\n[{name}]")
        lines.append(dump_toml(v, name))
    return "\n".join(lines)


def save_config(config: Dict[str, Any], path: str) -> None:
    with open(path, "w") as f:
        f.write(dump_toml(config) + "\n")


def merge_config(*config_dicts: Dict[str, Any]) -> Dict[str, Any]:
    """Deep merge; later dicts override, and every key in a later dict must
    already exist in the first (common) dict (train_base/utils.py:129-179)."""

    def merge(older, newer):
        for new_key in newer:
            if new_key not in older:
                raise KeyError(f"Key {new_key} is not exist in the common config.")
            if isinstance(older[new_key], dict):
                older[new_key] = merge(older[new_key], newer[new_key])
            else:
                older[new_key] = deepcopy(newer[new_key])
        return older

    return reduce(merge, config_dicts[1:], deepcopy(config_dicts[0]))


def initialize_module(path: str, args: Dict[str, Any] | None = None, initialize: bool = True):
    """Dotted-path reflection: "cruse_tpu.models.cruse.CruseNet" -> class or
    instance (train_base/utils.py:68-100)."""
    module_path = ".".join(path.split(".")[:-1])
    name = path.split(".")[-1]
    module = importlib.import_module(module_path)
    cls_or_fn = getattr(module, name)
    if initialize:
        return cls_or_fn(**args) if args else cls_or_fn()
    return cls_or_fn


class AttrDict(dict):
    """Attribute-style nested dict (utils/utils_base.py:49-57)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self
        for k, v in self.items():
            if isinstance(v, dict) and not isinstance(v, AttrDict):
                self[k] = AttrDict(v)

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError as e:
            raise AttributeError(item) from e


def load_hparams(path: str) -> AttrDict:
    """YAML hparams -> AttrDict (utils/utils_base.py:58-62)."""
    import yaml

    with open(path) as f:
        return AttrDict(yaml.safe_load(f))


def dump_hparams(hparams: dict, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(dict(hparams), f)
