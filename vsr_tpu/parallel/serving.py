"""Mesh-sharded serving: scale the fused inference pipeline across chips.

The reference serves on one GPU (SURVEY.md §2.9 — no parallelism anywhere);
this is the TPU-native scale-out path for batch inference: the frame batch
shards over the ``'data'`` mesh axis and (optionally) each frame's H axis
over ``'spatial'``, parameters replicate, and the XLA SPMD partitioner
inserts the conv halo exchanges and any resharding (e.g. the k-space
matmuls contract over the full H axis) — same recipe as the GSPMD training
step (parallel/gspmd.py), applied to serving.

The frame count rarely divides the mesh evenly (volumes have D*T frames),
so the wrapper pads the batch by repeating the last frame and slices the
outputs back — callers see the exact unpadded result.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsr_tpu.parallel.gspmd import _prune_spec


def parse_mesh_axes(spec: str) -> dict[str, int]:
    """``"data=2,spatial=4"`` -> ``{"data": 2, "spatial": 4}`` (-1 allowed)."""
    axes: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition("=")
        axes[name.strip()] = int(size) if size else -1
    if not axes:
        raise ValueError(f"Empty mesh spec: {spec!r}")
    return axes


def shard_pipeline(pipeline_fn, mesh: Mesh, batch_axis: str = "data",
                   spatial_axis: str = "spatial", seq_len: int | None = None):
    """Wrap ``pipeline_fn(hr_frames: (N, H, W)) -> pytree`` for the mesh.

    Returns a callable with identical semantics: the batch is padded up to a
    multiple of the ``data`` axis size (edge-repeat), sharded ``(data,
    spatial, None)``, run under one partitioned jit, and every output with a
    leading batch axis is sliced back to the true N. H must be divisible by
    the ``spatial`` axis size (the preprocessing center-crop to a multiple
    of 12 guarantees this for meshes up to spatial=4).

    ``seq_len``: for whole-sequence (VSR ``--video``) pipelines that reshape
    N = D*T into (D, T, ...) internally — padding then happens in units of
    whole T-frame sequences so the number of sequences divides the data
    axis and the internal reshape keeps the sharding aligned.
    """
    dp = mesh.shape.get(batch_axis, 1)
    sp = mesh.shape.get(spatial_axis, 1)
    unit = seq_len or 1
    in_sharding = NamedSharding(mesh, _prune_spec(mesh, P(batch_axis, spatial_axis)))
    jitted = jax.jit(pipeline_fn, in_shardings=(in_sharding,))

    def wrapped(hr_frames):
        frames = np.asarray(hr_frames)
        n, h, _w = frames.shape
        if h % sp:
            raise ValueError(
                f"H={h} is not divisible by the '{spatial_axis}' mesh axis ({sp})")
        if n % unit:
            raise ValueError(f"N={n} is not whole sequences of T={unit}")
        pad = ((-(n // unit)) % dp) * unit
        if pad:
            frames = np.concatenate(
                [frames, np.tile(frames[-unit:], (pad // unit, 1, 1))])
        out = jitted(frames)
        if pad:
            out = jax.tree_util.tree_map(
                lambda a: a[:n] if a.ndim and a.shape[0] == n + pad else a, out)
        return out

    return wrapped
