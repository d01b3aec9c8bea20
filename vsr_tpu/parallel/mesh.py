"""Device mesh construction.

The reference is single-GPU (SURVEY.md §2.9); multi-chip data/spatial
parallelism is a new first-class capability of this framework: a
``jax.sharding.Mesh`` over the local (or distributed) device set, with the
batch axis ``'data'`` and an optional spatial axis ``'spatial'`` for halo-
sharded convolutions over large volumes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from ``{'data': n, 'spatial': m, ...}``.

    ``-1`` for one axis means "all remaining devices". Defaults to a pure
    data-parallel mesh over every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = list(axes.keys())
    sizes = list(axes.values())
    if sizes.count(-1) > 1:
        raise ValueError("Only one mesh axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}")
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"Mesh needs {total} devices, have {len(devices)}")
    grid = np.array(devices[:total]).reshape(sizes)
    return Mesh(grid, tuple(names))
