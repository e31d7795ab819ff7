"""Nested-dataclass configuration system with dotted CLI overrides and YAML
round-trip.

Capability parity with the reference's config substrate (see SURVEY.md §5):
the reference composes nested ``InstantiateConfig`` dataclasses exposed as
dotted CLI flags via tyro (/root/reference/signerf/signerf_config.py:17-65,
README.md:117-131) and yaml-serializes configs next to outputs so runs are
reproducible (datasetgenerator.py:180-182, signerf_trainer.py:87-94).

This implementation is dependency-free (no tyro): any ``@dataclasses.dataclass``
tree works.  Values are coerced to the annotated field type, tuples/paths are
handled, and unknown keys raise.  ``to_yaml``/``from_yaml`` use a small
self-contained emitter/parser over the JSON-compatible subset of YAML so we do
not depend on pyyaml being present.
"""

from __future__ import annotations

import dataclasses
import json
import typing
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Type, TypeVar, Union

T = TypeVar("T")

# ---------------------------------------------------------------------------
# dict <-> dataclass
# ---------------------------------------------------------------------------


def to_dict(cfg: Any) -> Any:
    """Recursively convert a dataclass tree to plain JSON-able python."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        out = {"__class__": type(cfg).__name__}
        for f in dataclasses.fields(cfg):
            out[f.name] = to_dict(getattr(cfg, f.name))
        return out
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, Path):
        return str(cfg)
    if hasattr(cfg, "tolist"):  # numpy / jax scalars and arrays
        return cfg.tolist()
    return cfg


def _strip_optional(tp: Any) -> Any:
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return args[0]
    return tp


def _coerce(value: Any, tp: Any) -> Any:
    """Coerce `value` to annotated type `tp` (best-effort, raises on nonsense)."""
    if value is None:
        return None
    tp = _strip_optional(tp)
    origin = typing.get_origin(tp)
    if dataclasses.is_dataclass(tp) and isinstance(value, dict):
        return from_dict(tp, value)
    if tp is Any or tp is dataclasses.MISSING:
        return value
    if origin in (tuple, Tuple):
        args = typing.get_args(tp)
        seq = value if isinstance(value, (list, tuple)) else json.loads(str(value))
        if args and args[-1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in seq)
        if args:
            return tuple(_coerce(v, a) for v, a in zip(seq, args))
        return tuple(seq)
    if origin in (list, List):
        args = typing.get_args(tp)
        seq = value if isinstance(value, (list, tuple)) else json.loads(str(value))
        return [_coerce(v, args[0]) if args else v for v in seq]
    if origin in (dict, Dict):
        return dict(value)
    if tp is bool:
        if isinstance(value, bool):
            return value
        return str(value).lower() in ("1", "true", "yes", "on")
    if tp is int:
        return int(value)
    if tp is float:
        return float(value)
    if tp is str:
        return str(value)
    if tp is Path:
        return Path(value)
    if isinstance(tp, type) and isinstance(value, tp):
        return value
    return value


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build dataclass `cls` from a plain dict (inverse of :func:`to_dict`)."""
    if not dataclasses.is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    hints = typing.get_type_hints(cls)
    kwargs = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for key, val in data.items():
        if key == "__class__":
            continue
        if key not in field_names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        kwargs[key] = _coerce(val, hints.get(key, Any))
    return cls(**kwargs)


# ---------------------------------------------------------------------------
# dotted overrides  (e.g. --pipeline.dataset-generator.diffuser.steps 30)
# ---------------------------------------------------------------------------


def apply_overrides(cfg: T, overrides: Dict[str, Any]) -> T:
    """Return a copy of `cfg` with dotted-path overrides applied.

    Dashes in path components are normalized to underscores, matching the
    reference's CLI flag convention (README.md:117-131).
    """
    out = cfg
    for dotted, value in overrides.items():
        parts = [p.replace("-", "_") for p in dotted.split(".")]
        out = _set_path(out, parts, value)
    return out


def _set_path(cfg: Any, parts: List[str], value: Any) -> Any:
    name = parts[0]
    if not dataclasses.is_dataclass(cfg):
        raise TypeError(f"cannot descend into non-dataclass at {name!r}")
    field = next((f for f in dataclasses.fields(cfg) if f.name == name), None)
    if field is None:
        raise KeyError(
            f"unknown config key {name!r} on {type(cfg).__name__} "
            f"(valid: {[f.name for f in dataclasses.fields(cfg)]})"
        )
    hints = typing.get_type_hints(type(cfg))
    if len(parts) == 1:
        new_val = _coerce(value, hints.get(name, Any))
    else:
        new_val = _set_path(getattr(cfg, name), parts[1:], value)
    return dataclasses.replace(cfg, **{name: new_val})


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse ``--a.b.c value`` / ``--a.b.c=value`` pairs into an override dict."""
    overrides: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise ValueError(f"expected --key, got {tok!r}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"missing value for {tok!r}")
            val = argv[i + 1]
            i += 2
        overrides[key] = val
    return overrides


# ---------------------------------------------------------------------------
# YAML round-trip (JSON-subset emitter; reader accepts our own output)
# ---------------------------------------------------------------------------


def _emit(obj: Any, indent: int) -> List[str]:
    pad = "  " * indent
    lines: List[str] = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, (dict, list)) and v:
                lines.append(f"{pad}{k}:")
                lines.extend(_emit(v, indent + 1))
            else:
                lines.append(f"{pad}{k}: {json.dumps(v)}")
    elif isinstance(obj, list):
        for v in obj:
            if isinstance(v, (dict, list)) and v:
                lines.append(f"{pad}-")
                lines.extend(_emit(v, indent + 1))
            else:
                lines.append(f"{pad}- {json.dumps(v)}")
    else:
        lines.append(f"{pad}{json.dumps(obj)}")
    return lines


def to_yaml(cfg: Any) -> str:
    return "\n".join(_emit(to_dict(cfg), 0)) + "\n"


def _parse_block(lines: List[str], pos: int, indent: int) -> Tuple[Any, int]:
    # Decide list vs dict from the first content line.
    result: Any = None
    while pos < len(lines):
        raw = lines[pos]
        stripped = raw.strip()
        if not stripped or stripped.startswith("#"):
            pos += 1
            continue
        cur_indent = (len(raw) - len(raw.lstrip())) // 2
        if cur_indent < indent:
            break
        if stripped.startswith("- ") or stripped == "-":
            if result is None:
                result = []
            if stripped == "-":
                child, pos = _parse_block(lines, pos + 1, indent + 1)
                result.append(child)
            else:
                result.append(json.loads(stripped[2:]))
                pos += 1
        else:
            if result is None:
                result = {}
            key, _, rest = stripped.partition(":")
            rest = rest.strip()
            if rest == "":
                child, pos = _parse_block(lines, pos + 1, indent + 1)
                result[key] = child if child is not None else {}
            else:
                result[key] = json.loads(rest)
                pos += 1
    return result, pos


def from_yaml(cls: Type[T], text: str) -> T:
    data, _ = _parse_block(text.split("\n"), 0, 0)
    return from_dict(cls, data or {})


def save_yaml(cfg: Any, path: Union[str, Path]) -> None:
    Path(path).write_text(to_yaml(cfg))


def load_yaml(cls: Type[T], path: Union[str, Path]) -> T:
    return from_yaml(cls, Path(path).read_text())
