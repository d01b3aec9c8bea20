"""Data-parallel training step via ``shard_map`` + explicit collectives.

The step function runs per-device on its batch shard; gradients (and logged
scalars) are combined with ``jax.lax.pmean`` over the ``'data'`` mesh axis —
on TPU this lowers to an ICI allreduce. Parameters and optimizer state are
replicated; every device applies the identical update, so no broadcast is
needed afterwards.

This is the TPU-native replacement for the DDP/NCCL layer the reference never
had (SURVEY.md §2.9): the driver-mandated "multi-chip data-parallel training
over ICI".
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def shard_batch_specs(mesh: Mesh):
    """(replicated, replicated, batch-sharded, batch-sharded) in_specs for a
    (params, opt_state, inputs, targets) step signature."""
    return (P(), P(), P("data"), P("data"))


def make_dp_step(
    grad_and_update: Callable,
    mesh: Mesh,
    donate: bool = True,
):
    """Wrap a per-device step into a pjit-ed SPMD step.

    ``grad_and_update(params, opt_state, inputs, targets, axis_name)`` must
    compute local grads, ``jax.lax.pmean`` them over ``axis_name``, apply the
    optimizer, and return ``(params, opt_state, scalars, outputs)`` — see
    ``BaseTrainer._dp_step`` for the canonical body.
    """
    sharded = shard_map(
        partial(grad_and_update, axis_name="data"),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P(), P(), P(), P("data")),
        check_vma=False,
    )
    if donate:
        return jax.jit(sharded, donate_argnums=(0, 1))
    return jax.jit(sharded)
