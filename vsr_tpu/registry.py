"""Name-based component registries.

The reference wires every object from YAML by reflection over module
namespaces (``_get_instance`` at ``/root/reference/src/main.py:167-178`` plus
re-export registries in each ``__init__.py``). The idiomatic equivalent here
is a small set of explicit registries keyed by category and class name, with a
``build`` helper reproducing the ``cls(*args, **cfg.kwargs)`` call convention,
including the "kwargs may be absent" case.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, TypeVar

T = TypeVar("T")

# category -> {name -> class}
_REGISTRIES: dict[str, dict[str, type]] = {}

KNOWN_CATEGORIES = (
    "dataset",
    "transform",
    "net",
    "loss",
    "metric",
    "optimizer",
    "lr_scheduler",
    "logger",
    "monitor",
    "trainer",
    "predictor",
    "loader",
)


def register(category: str, name: str | None = None) -> Callable[[type], type]:
    """Class decorator: ``@register('net', 'EDSRNet')`` (name defaults to
    ``cls.__name__``)."""

    def deco(cls: type) -> type:
        key = name or cls.__name__
        bucket = _REGISTRIES.setdefault(category, {})
        if key in bucket and bucket[key] is not cls:
            raise ValueError(f"Duplicate registration {category}/{key}")
        bucket[key] = cls
        return cls

    return deco


_populated = False


def _ensure_populated() -> None:
    """Import every registering module once (lazy, so ``import vsr_tpu``
    stays light but the first registry lookup finds everything)."""
    global _populated
    if _populated:
        return
    _populated = True
    import importlib

    for mod in (
        "vsr_tpu.data.datasets",
        "vsr_tpu.data.transforms",
        "vsr_tpu.data.loader",
        "vsr_tpu.losses",
        "vsr_tpu.metrics",
        "vsr_tpu.models",
        "vsr_tpu.optim",
        "vsr_tpu.callbacks.logger",
        "vsr_tpu.callbacks.monitor",
        "vsr_tpu.runner.trainers",
        "vsr_tpu.runner.device_trainer",
        "vsr_tpu.runner.predictors",
    ):
        importlib.import_module(mod)


def get_class(category: str, name: str) -> type:
    bucket = _REGISTRIES.get(category, {})
    if name not in bucket:
        _ensure_populated()
        bucket = _REGISTRIES.get(category, {})
    if name not in bucket:
        import difflib

        available = sorted(bucket)
        close = difflib.get_close_matches(name, available, n=3, cutoff=0.55)
        hint = f" Did you mean {close}?" if close else ""
        raise KeyError(
            f"No {category!r} named {name!r} is registered.{hint} "
            f"Available: {available}"
        )
    return bucket[name]


def names(category: str) -> list[str]:
    _ensure_populated()
    return sorted(_REGISTRIES.get(category, {}))


def build(category: str, spec: Mapping[str, Any], *args: Any, **extra_kwargs: Any) -> Any:
    """Instantiate ``spec = {name, kwargs?}`` from a registry.

    Mirrors the reference convention: positional ``args`` first, then the
    config's ``kwargs`` merged with ``extra_kwargs`` (extra wins, like the
    reference's ``config.X.kwargs.update(...)`` pattern).
    """
    cls = get_class(category, spec["name"])
    kwargs = dict(spec.get("kwargs") or {})
    kwargs.update(extra_kwargs)
    return cls(*args, **kwargs)
