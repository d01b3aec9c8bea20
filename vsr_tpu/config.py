"""Attribute-access configuration tree loaded from YAML.

Equivalent role to the reference's ``python-box.Box`` usage
(``/root/reference/src/main.py:18``): a nested dict whose members are
reachable as attributes, plus YAML load/save helpers. The YAML schema is the
same positional-section layout the reference uses
(``main / dataset / dataloader / net / losses / metrics / optimizer /
[lr_scheduler] / logger / monitor / trainer|predictor``, each ``{name,
kwargs}`` — ``/root/reference/configs/train/example_config.yaml``).
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """A dict with attribute access, recursively wrapping nested mappings.

    Unlike ``Box`` we keep semantics minimal: attribute reads mirror item
    reads, missing attributes raise ``AttributeError`` (so ``getattr(cfg,
    'lr_scheduler', None)`` works), and ``get``/``setdefault`` behave like
    ``dict``.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        merged: dict[str, Any] = {}
        if data is not None:
            merged.update(data)
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, self._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            raise AttributeError(
                f"Config has no attribute {key!r}; available: {sorted(self.keys())}"
            ) from None

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError:
            raise AttributeError(key) from None

    def update(self, *args: Any, **kwargs: Any) -> None:  # type: ignore[override]
        other = dict(*args, **kwargs)
        for key, value in other.items():
            self[key] = value

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key not in self:
            self[key] = default
        return self[key]

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> dict[str, Any]:
        def unwrap(value: Any) -> Any:
            if isinstance(value, Config):
                return {k: unwrap(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [unwrap(v) for v in value]
            return value

        return {k: unwrap(v) for k, v in self.items()}

    def __deepcopy__(self, memo: dict) -> "Config":
        return Config(copy.deepcopy(self.to_dict(), memo))

    def __iter__(self) -> Iterator[str]:
        return super().__iter__()

    def __repr__(self) -> str:
        return f"Config({dict.__repr__(self)})"


def load_config(path: str | Path) -> Config:
    """Load a YAML file into a :class:`Config` tree."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    if data is None:
        data = {}
    if not isinstance(data, Mapping):
        raise TypeError(f"Top-level YAML in {path} must be a mapping, got {type(data)}")
    return Config(data)


def save_config(config: Config | Mapping[str, Any], path: str | Path) -> None:
    """Persist a config next to experiment results (``main.py:23-25`` parity)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = config.to_dict() if isinstance(config, Config) else dict(config)
    with open(path, "w") as f:
        yaml.safe_dump(data, f, default_flow_style=False, sort_keys=False)
