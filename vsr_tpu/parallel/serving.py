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


#: Axis names the serving/GSPMD partition specs know about.  'data' shards
#: the frame batch, 'spatial' each frame's H axis, 'seq' the volume DEPTH
#: of the volumetric pipelines (a volume too deep for one chip's HBM
#: shards its slices at inference exactly like training — SURVEY §5),
#: 'model' the parameters' output-feature dims (vsr_tpu/parallel/tp.py),
#: 'expert' the MoE expert stacks' leading num_experts dim
#: (vsr_tpu/parallel/ep.py).
KNOWN_AXES = ("data", "spatial", "seq", "model", "expert")


def parse_mesh_axes(spec: str) -> dict[str, int]:
    """``"data=2,spatial=4"`` -> ``{"data": 2, "spatial": 4}``.

    ``-1`` means "all remaining devices" and must be written explicitly
    (``data=-1``); a bare axis name without ``=size`` is rejected so typos
    fail here instead of silently becoming a replicated no-op axis.  Axis
    names are validated against :data:`KNOWN_AXES` for the same reason.
    """
    axes: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, sep, size = part.partition("=")
        name = name.strip()
        if name not in KNOWN_AXES:
            raise ValueError(
                f"Unknown mesh axis {name!r} in {spec!r}; known axes: "
                f"{', '.join(KNOWN_AXES)}")
        if not sep or not size.strip():
            raise ValueError(
                f"Mesh axis {name!r} needs an explicit size, e.g. "
                f"'{name}=2' (or '{name}=-1' for all remaining devices)")
        axes[name] = int(size)
    if not axes:
        raise ValueError(f"Empty mesh spec: {spec!r}")
    return axes


def shard_volume_pipeline(pipeline_fn, mesh: Mesh, vmode: str, seq_t: int,
                          factor: int = 1):
    """Volumetric serving over a mesh: depth over ``'seq'``, time-batch
    over ``'data'`` (3d only), H over ``'spatial'``.

    The raw slice-major input frames stay replicated — the flat N = D*T
    dim has no rectangular sharding that survives the (D, T) regroup, and
    prep is a sliver of the conv compute; ``make_pipeline`` pins the
    regrouped volume batch to the mesh with a sharding constraint, so
    everything downstream (the 3D conv stack, halo exchanges over ICI)
    runs partitioned. No padding: volume geometry must divide the mesh
    (loud errors beat silently serving a padded half-empty volume)."""
    sq = mesh.shape.get("seq", 1)
    dp = mesh.shape.get("data", 1)
    sp = mesh.shape.get("spatial", 1)
    if vmode == "3d" and dp > 1 and seq_t % dp:
        raise ValueError(
            f"per-slice T={seq_t} is not divisible by the 'data' mesh "
            f"axis ({dp}) — 3d volume serving batches the T time points")
    jitted = jax.jit(pipeline_fn)

    def wrapped(hr_frames):
        frames = np.asarray(hr_frames)
        n, h, _w = frames.shape
        if n % seq_t:
            raise ValueError(f"N={n} is not whole slices of T={seq_t}")
        depth = n // seq_t
        if depth % sq:
            raise ValueError(
                f"volume depth D={depth} is not divisible by the 'seq' "
                f"mesh axis ({sq})")
        if (h // factor) % sp:
            # The tensor pinned to the mesh is the REGROUPED LR batch
            # (height h/factor), not the HR input — validate what GSPMD
            # actually shards (review catch: checking h alone would let
            # an uneven LR sharding through with padded half-empty
            # shards).
            raise ValueError(
                f"LR height {h // factor} (HR {h} / factor {factor}) is "
                f"not divisible by the 'spatial' mesh axis ({sp})")
        return jitted(frames)

    return wrapped


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
    batched_leaf_cache: dict = {}  # (shape, pad) -> which outputs to slice

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
            # Identify which outputs actually carry the batch axis by
            # abstract-evaluating the pipeline at both batch sizes: a leaf
            # is batched iff its leading dim tracks N.  (A pure shape match
            # against n+pad would mis-slice any output whose leading dim
            # coincidentally equals the padded batch.)  The decision depends
            # only on the input geometry, so it is traced once per
            # (shape, pad) and cached — not per serving call.
            key = (frames.shape, pad)
            if key not in batched_leaf_cache:
                spec = jax.ShapeDtypeStruct(frames.shape, frames.dtype)
                spec_unpadded = jax.ShapeDtypeStruct(
                    (n,) + frames.shape[1:], frames.dtype)
                shapes_p = jax.eval_shape(pipeline_fn, spec)
                shapes_u = jax.eval_shape(pipeline_fn, spec_unpadded)
                batched_leaf_cache[key] = jax.tree_util.tree_map(
                    lambda sp_, su: bool(sp_.shape[:1] == (n + pad,)
                                         and su.shape[:1] == (n,)),
                    shapes_p, shapes_u)
            out = jax.tree_util.tree_map(
                lambda a, batched: a[:n] if (a.ndim and batched) else a,
                out, batched_leaf_cache[key])
        return out

    return wrapped
