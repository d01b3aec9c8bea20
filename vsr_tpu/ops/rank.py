"""Pallas TPU kernel: descending rank of every element within its row.

The MoE expert-choice router (models/moe.py) needs, per (group, expert)
row of ``gs`` affinities, each token's rank in descending order with
stable ties (earlier index wins) — exactly ``lax.top_k``'s selection and
slot order. The XLA formulation (a pairwise-comparison ``reduce_sum``
over a broadcast ``(rows, gs, gs)``) runs at ~85 Gops/s on a v5e — it is
HBM-bound on the broadcast it materializes (BENCH.md round 3: 20% of MoE
serving device time). This kernel keeps a ``(TILE_R, gs)`` block resident
in VMEM and accumulates the count with a ``fori_loop`` over the ``gs``
columns — pure VPU compares, the gs^2 intermediate never exists.

``pairwise_rank`` is exact (no approximation) and non-differentiable by
construction (integer output — like argmax, it carries zero tangent);
gradients in the MoE layer flow through the gate values, never the rank.

One IEEE caveat shared with the XLA pairwise formulation: ``-0.0`` ties
with ``0.0`` under ``>``/``==`` where ``lax.top_k``'s total-order sort
splits them (+0 first). MoE affinities are softmax outputs (>= 0, never
-0.0), so the routers agree wherever the layer calls them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Rows of affinities ranked per kernel program. Sized so the (TILE_R,
#: gs, gs) comparison intermediate stays a few MB of VMEM at gs=256.
TILE_R = 16


def _rank_kernel(af_ref, out_ref):
    # The whole pairwise comparison for a small row tile, vectorized in
    # VMEM — no lane-dim dynamic slicing (Mosaic requires those to be
    # 128-aligned) and no HBM round trip for the (gs, gs) broadcast.
    af = af_ref[:]                                       # (TILE_R, gs) f32
    r, gs = af.shape
    a_i = af[:, :, None]                                 # (TILE_R, gs_i, 1)
    a_j = af[:, None, :]                                 # (TILE_R, 1, gs_j)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (r, gs, gs), 1)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (r, gs, gs), 2)
    cnt = ((a_j > a_i) | ((a_j == a_i) & (col_j < col_i))).astype(jnp.int32)
    out_ref[:] = jnp.sum(cnt, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_rank(af: jax.Array, interpret: bool = False) -> jax.Array:
    """``af``: (..., gs) float32 scores. Returns int32 (..., gs): for each
    trailing row, element i's count of j with ``a_j > a_i`` or
    (``a_j == a_i`` and ``j < i``) — its stable descending rank.

    The row axis is tiled by :data:`TILE_R` (ragged tails are grid-padded);
    the score axis must be a multiple of 128 lanes (callers fall back to
    the XLA reduction otherwise). ``interpret=True`` runs the Pallas
    interpreter (CPU tests).
    """
    *lead, gs = af.shape
    rows = 1
    for d in lead:
        rows *= d
    flat = af.reshape(rows, gs).astype(jnp.float32)
    grid = (pl.cdiv(rows, TILE_R),)
    out = pl.pallas_call(
        _rank_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, gs), jnp.int32),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE_R, gs), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_R, gs), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out.reshape(*lead, gs)


def supports_pallas_rank(gs: int) -> bool:
    """The kernel's constraints: the score axis must fill whole 128-lane
    registers, and the per-program (TILE_R, gs, gs) comparison
    intermediate (int32 count + bool operands, ~8 bytes/element) must fit
    a conservative VMEM budget — larger group sizes fall back to the XLA
    reduction instead of failing Mosaic compilation."""
    return gs % 128 == 0 and TILE_R * gs * gs * 8 <= 8 * 1024 * 1024
