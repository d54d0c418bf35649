"""YAML config + CLI override system.

Behavioral spec: reference `espnet2/utils/config_argparse.py` (YAML file
provides argparse defaults), `espnet2/train/class_choices.py` (ClassChoices
registries adding --<name>/--<name>_conf pairs) and `--print_config`
(`espnet2/tasks/abs_task.py:1019`). Simplified to a flat
dataclass-per-section config: YAML sections map onto dataclasses, CLI
overrides use dotted keys (--model.d_model 512), and the fully-resolved
config is dumped to <output_dir>/config.yaml which inference re-reads
(`abs_task.py:1203,1826`).
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Any, Dict, Optional, Type

import yaml


def load_yaml(path) -> Dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def dump_yaml(obj: Dict[str, Any], path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(obj, f, sort_keys=False)


def _coerce(value: str, typ) -> Any:
    """Parse a CLI string into the field type.

    NB: with `from __future__ import annotations`, dataclass field types are
    *strings* ("int", "Optional[int]", …), so matching is name-based.
    """
    name = typ if isinstance(typ, str) else getattr(typ, "__name__", str(typ))
    is_opt = name.startswith("Optional[")
    if is_opt:
        if str(value).lower() in ("none", "null", ""):
            return None
        name = name[len("Optional["):-1]
    if name in ("bool",):
        return str(value).lower() in ("1", "true", "yes", "on")
    if name in ("int",):
        return int(value)
    if name in ("float",):
        return float(value)
    if isinstance(value, str) and value.lower() in ("none", "null"):
        return None
    if "Tuple" in name or "tuple" in name:
        if isinstance(value, str) and ("," in value or value.startswith("[")):
            items = value.strip().strip("[]()").split(",")
            out = []
            for x in items:
                x = x.strip()
                if not x:
                    continue
                try:
                    out.append(int(x))
                except ValueError:
                    out.append(float(x))
            return tuple(out)
    return value


def dataclass_from_dict(cls: Type, d: Dict[str, Any]):
    """Build a dataclass, coercing string values and rejecting unknown keys."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in (d or {}).items():
        if k not in fields:
            raise KeyError(
                f"unknown config key '{k}' for {cls.__name__}; "
                f"valid: {sorted(fields)}"
            )
        f = fields[k]
        # nested dataclass section (detected via the field default)
        if dataclasses.is_dataclass(f.default) and isinstance(v, dict):
            sub = dataclass_from_dict(type(f.default), v)
            overrides = {sk: getattr(sub, sk) for sk in v}
            v = dataclasses.replace(f.default, **overrides)
        elif isinstance(v, str):
            v = _coerce(v, f.type)
        if isinstance(v, list) and (
            str(f.type).startswith("typing.Tuple") or f.type is tuple
        ):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def dataclass_to_dict(obj) -> Dict[str, Any]:
    import numpy as np

    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, tuple):
            v = list(v)
        if dataclasses.is_dataclass(v):
            v = dataclass_to_dict(v)
        if not isinstance(v, (int, float, str, bool, list, dict, type(None))):
            try:
                v = np.dtype(v).name  # dtype-like (e.g. jnp.bfloat16)
            except TypeError:
                v = str(v)
        out[f.name] = v
    return out


def parse_cli_overrides(argv) -> Dict[str, Any]:
    """['--model.d_model', '512', '--flag', 'true'] -> nested dict."""
    out: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"expected --key, got {arg}")
        key = arg[2:]
        if "=" in key:
            key, value = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for {arg}")
            value = argv[i + 1]
            i += 2
        cur = out
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value
    return out


def merge_dicts(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out
