"""Tensor (model) parallelism: parameters sharded over a ``'model'`` axis.

``'data'``/``'spatial'`` shard the *activations* — the right axes for the SR
nets in this project, whose feature maps dwarf their parameters (the
reference framework has no parallelism at all, SURVEY.md §2.9).  The
``'model'`` axis covers the opposite regime — parameter / optimizer-state
HBM pressure (very wide variants, many optimizer moments): every parameter
leaf whose trailing dimension is its output-feature/channel dimension shards
that dimension across ``'model'`` (Megatron-style column sharding), the
optimizer moments inherit the identical layout through the same shape rule,
and the XLA SPMD partitioner inserts the all-gathers / partial-sum
reductions at layer boundaries — GSPMD annotations instead of hand-written
collectives, the same recipe as :mod:`vsr_tpu.parallel.gspmd`.

The shape rule is deliberately positional, not name-based: flax convs store
kernels as ``(kh, kw, cin, cout)`` and biases/PReLU alphas as ``(c,)``, so
"shard the last dim when it divides the axis" shards exactly the
output-feature dimension of every layer wide enough to split, and
replicates the narrow head/tail convs (``cout`` 1) and scalars
(optimizer counts, schedules) that cannot or should not split.  Any such
assignment is *legal* under GSPMD — the partitioner guarantees the math of
the unsharded program — so the rule only decides placement, never
correctness.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: The reserved mesh-axis name for parameter (tensor) sharding.
MODEL_AXIS = "model"


def reject_spatial_x_model(mesh: Mesh, spatial_axis: str = "spatial",
                           axis: str = MODEL_AXIS) -> None:
    """Refuse meshes that combine activation-H ('spatial') and parameter
    ('model') sharding.

    jax 0.9.0's SPMD partitioner miscompiles SAME convs whose input H axis
    is sharded over one mesh axis while the kernel's feature dim is sharded
    over another: wrong numerics in the halo-exchange path (1x1 kernels are
    exact, kh>1 are not), with the broken direction (fwd/grad) flipping
    under gather/pinning annotations — no robust workaround exists at the
    annotation level. Verified on the CPU backend
    (scripts/repro_spmd_spatial_model_conv.py); single-chip hardware here
    cannot exonerate the TPU partitioner, so the combination is refused
    rather than risking silently-wrong training/serving.
    """
    if mesh.shape.get(axis, 1) > 1:
        # 'seq' shards another activation dim the convs reach over (volume
        # depth / temporal windows) — same halo-exchange machinery, same
        # miscompile exposure as 'spatial'.
        for act_axis in (spatial_axis, "seq"):
            if mesh.shape.get(act_axis, 1) > 1:
                raise NotImplementedError(
                    f"A mesh with both '{act_axis}' and '{axis}' axes is "
                    "rejected: the XLA SPMD partitioner (jax 0.9.0) "
                    "returns wrong numerics for activation-partitioned "
                    "convs with feature-sharded kernels (see "
                    "scripts/repro_spmd_spatial_model_conv.py). Use "
                    f"'data' x '{axis}' or 'data' x '{act_axis}' instead.")


def model_spec(shape, axis_size: int, axis: str = MODEL_AXIS) -> P:
    """PartitionSpec for one parameter leaf: shard the trailing dim over
    ``axis`` when it divides ``axis_size``; replicate otherwise."""
    if (
        axis_size > 1
        and len(shape) >= 1
        and shape[-1] >= axis_size
        and shape[-1] % axis_size == 0
    ):
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def model_partition_specs(tree, mesh: Mesh, axis: str = MODEL_AXIS):
    """PartitionSpec tree for a params / optimizer-state pytree.

    Applies :func:`model_spec` per leaf, so optimizer moments (same shapes
    as their parameters) land on the identical layout without any
    structure-matching between the two trees.
    """
    size = mesh.shape.get(axis, 1)
    return jax.tree_util.tree_map(
        lambda v: model_spec(getattr(v, "shape", ()), size, axis), tree)


def model_shardings(tree, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedSharding tree (for ``jax.jit`` in_shardings / ``device_put``).

    Python-scalar leaves (some optimizer states carry them) have no shape
    and land on the replicated spec."""
    size = mesh.shape.get(axis, 1)
    return jax.tree_util.tree_map(
        lambda v: NamedSharding(mesh, model_spec(getattr(v, "shape", ()), size, axis)),
        tree,
    )


def shard_model_params(tree, mesh: Mesh, axis: str = MODEL_AXIS):
    """``device_put`` the tree with its model shardings (host-side helper,
    used once at init so parameters arrive split instead of replicated)."""
    return jax.device_put(tree, model_shardings(tree, mesh, axis))
