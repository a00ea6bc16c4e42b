"""YAML config loading with `_BASE_` inheritance.

Parity with the reference's detectron2 YAML workflow (configs/*.yaml with
`_BASE_: Base.yaml`): nested dicts are deep-merged onto the base, then
applied onto the typed dataclass tree.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import yaml

from .config import Config, _coerce


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_with_base(path: str) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("_BASE_", None)
    if base:
        base_path = base if os.path.isabs(base) else os.path.join(os.path.dirname(path), base)
        return _deep_merge(_load_yaml_with_base(base_path), data)
    return data


def _apply(cfg_obj, data: dict, path=""):
    for key, value in data.items():
        name = key.lower()
        if not hasattr(cfg_obj, name):
            raise KeyError(f"unknown config key '{path}{key}'")
        current = getattr(cfg_obj, name)
        if dataclasses.is_dataclass(current):
            if not isinstance(value, dict):
                raise TypeError(f"'{path}{key}' expects a mapping")
            _apply(current, value, path=f"{path}{key}.")
        else:
            setattr(cfg_obj, name, _coerce(value, current))


def load_config(path: Optional[str] = None, opts: Optional[list] = None) -> Config:
    """Build a Config from a YAML file (with `_BASE_`) + CLI overrides."""
    cfg = Config()
    if path:
        _apply(cfg, _load_yaml_with_base(path))
    if opts:
        from .config import merge_from_list

        merge_from_list(cfg, opts)
    return cfg
