"""GSPMD (XLA auto-partitioned) train/eval steps for data x spatial meshes.

While the pure data-parallel path uses ``shard_map`` with explicit ``pmean``
collectives (data_parallel.py), spatial sharding of convolutions is left to
the XLA SPMD partitioner: the step function is jitted with input shardings
that put the batch on the ``'data'`` mesh axis and the H axis of every
frame/volume on the ``'spatial'`` axis, with parameters replicated. XLA then
inserts the conv halo exchanges (collective-permutes over ICI) and the
cross-mesh reductions for losses/gradients — the same math as single-device,
partitioned. This is the scaling-book recipe: pick a mesh, annotate
shardings, let the compiler place collectives.

No ``axis_name`` or manual ``pmean`` is needed: reductions over sharded axes
are global by construction, so gradients and logged scalars come out
replicated and numerically match the unsharded step (up to float
reassociation).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _prune_spec(mesh: Mesh, spec: P) -> P:
    """Drop axis names the mesh does not have (e.g. a spatial-only mesh
    {'spatial': m} works with the standard ('data', ..., 'spatial') specs —
    the absent 'data' axis degrades to replicated)."""
    return P(*(axis if axis in mesh.shape else None for axis in spec))


def _shardings(mesh: Mesh, spec_tree: Any):
    """Map a pytree of PartitionSpec (or a single one) to NamedShardings."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, _prune_spec(mesh, s)),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def make_gspmd_step(
    step_fn,
    mesh: Mesh,
    input_spec: Any,
    target_spec: Any,
    donate: bool = True,
):
    """jit ``step_fn(params, opt_state, inputs, targets)`` with replicated
    params/opt_state and the given input/target PartitionSpec trees."""
    rep = NamedSharding(mesh, P())
    in_shardings = (rep, rep, _shardings(mesh, input_spec),
                    _shardings(mesh, target_spec))
    if donate:
        return jax.jit(step_fn, in_shardings=in_shardings, donate_argnums=(0, 1))
    return jax.jit(step_fn, in_shardings=in_shardings)
