"""Tests for the nested-dataclass config system (dotted overrides, yaml)."""

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

from signerf_tpu import config as cfg


@dataclasses.dataclass
class Inner:
    steps: int = 20
    cfg_scale: float = 7.0
    prompt: str = ""
    size: Tuple[int, int] = (50, 50)
    url: Optional[str] = None


@dataclasses.dataclass
class Outer:
    name: str = "exp"
    path: Path = Path("./out")
    use_lpips: bool = True
    inner: Inner = dataclasses.field(default_factory=Inner)


def test_roundtrip_dict():
    o = Outer(name="x", inner=Inner(steps=33))
    d = cfg.to_dict(o)
    o2 = cfg.from_dict(Outer, d)
    assert o2 == o


def test_yaml_roundtrip(tmp_path):
    o = Outer(name="hello world", path=Path("/tmp/xyz"), inner=Inner(prompt="a bear: statue"))
    p = tmp_path / "c.yml"
    cfg.save_yaml(o, p)
    o2 = cfg.load_yaml(Outer, p)
    assert o2 == o


def test_dotted_overrides():
    o = Outer()
    o2 = cfg.apply_overrides(
        o, {"inner.steps": "42", "inner.cfg-scale": "3.5", "use-lpips": "false"}
    )
    assert o2.inner.steps == 42
    assert o2.inner.cfg_scale == 3.5
    assert o2.use_lpips is False
    assert o.inner.steps == 20  # original untouched


def test_tuple_coercion():
    o = cfg.apply_overrides(Outer(), {"inner.size": "[30, 40]"})
    assert o.inner.size == (30, 40)


def test_unknown_key_raises():
    import pytest

    with pytest.raises(KeyError):
        cfg.apply_overrides(Outer(), {"inner.nope": 1})


def test_cli_parse():
    ov = cfg.parse_cli_overrides(["--inner.steps", "9", "--name=abc"])
    assert ov == {"inner.steps": "9", "name": "abc"}
