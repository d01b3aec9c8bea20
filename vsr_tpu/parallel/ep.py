"""Expert parallelism: Mixture-of-Experts weights sharded over an
``'expert'`` mesh axis.

The reference framework has no MoE and no parallelism at all (SURVEY.md
§2.9); this axis completes the framework's mesh vocabulary (data / spatial /
seq / model / pipe / expert) for the MoE SR nets (:mod:`vsr_tpu.models.moe`).
The design is the GSPMD flavor of GShard/Switch expert parallelism:

- every expert-stacked parameter leaf — shape ``(E, ...)``, named
  ``expert_*`` by convention — shards its leading expert dimension over the
  ``'expert'`` mesh axis, and the optimizer moments inherit the identical
  layout through the same path rule;
- the per-expert token blocks inside the MoE layer are annotated with
  sharding constraints (:func:`constrain_expert_dim`, active only under
  :func:`use_mesh`), so the XLA SPMD partitioner splits the expert
  compute across the axis instead of all-gathering the expert weights.
  The COMPILED schedule (verified from the partitioned HLO,
  tests/test_expert_parallel.py::test_ep_compiled_schedule): tokens stay
  replicated over ``'expert'``, each device computes the router logits,
  dispatch, and FFN for ITS experts only, and the partitioner all-reduces
  the router softmax stats (tiny) plus the combined (G, gs, d) output
  over the axis — an all-reduce schedule, not GShard's all-to-all (which
  arises when tokens are sharded over the same axis as the experts; with
  expert-replicated tokens no token exchange is needed at all).

Like :mod:`vsr_tpu.parallel.tp`, placement is annotation-only: any
assignment is legal under GSPMD (the partitioner guarantees the unsharded
program's math), so these rules decide placement, never correctness.

Identification is by NAME, not position: expert weights are the only leaves
whose parameter name starts with ``expert_`` (enforced by convention in
``models/moe.py``), which keeps the rule orthogonal to the positional
trailing-dim rule tensor parallelism uses — conv kernels, biases and scalar
optimizer state all stay replicated under a pure ``{'data', 'expert'}``
mesh.
"""

from __future__ import annotations

import contextlib
import threading

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: The reserved mesh-axis name for expert (MoE) sharding.
EXPERT_AXIS = "expert"

#: Parameter-name prefix marking expert-stacked leaves (leading dim = E).
EXPERT_PREFIX = "expert_"

_local = threading.local()


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Trace-time context handing the mesh to MoE layers so they can pin
    their per-expert intermediates (:func:`constrain_expert_dim`). The
    GSPMD step wrapper enters it around tracing; outside any context the
    layers run un-annotated (single-device / replicated execution)."""
    prev = getattr(_local, "mesh", None)
    _local.mesh = mesh
    try:
        yield
    finally:
        _local.mesh = prev


def current_mesh() -> Mesh | None:
    return getattr(_local, "mesh", None)


def constrain_expert_dim(x, dim: int):
    """Pin array dimension ``dim`` of ``x`` to the ``'expert'`` mesh axis
    when tracing under :func:`use_mesh` (with an ``'expert'`` axis whose
    size divides the dim); identity otherwise.

    This is what keeps the per-expert compute on the experts' devices:
    the expert-stacked weights alone would let the partitioner choose to
    all-gather them per device (legal, but data-parallel in disguise);
    pinning the dispatched token block forces it to compute each expert's
    block locally and reduce the combine over the axis instead.
    """
    mesh = current_mesh()
    if mesh is None or mesh.shape.get(EXPERT_AXIS, 1) <= 1:
        return x
    if x.shape[dim] % mesh.shape[EXPERT_AXIS]:
        return x
    spec = [None] * x.ndim
    spec[dim] = EXPERT_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def _leaf_name(path) -> str:
    """Last dict/attribute key of a tree path (the flax param name; optax
    moment trees mirror the param dict, so the same name survives)."""
    for entry in reversed(path):
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "name", None)
        if isinstance(key, str):
            return key
    return ""


def expert_spec(path, shape, axis_size: int, axis: str = EXPERT_AXIS) -> P:
    """PartitionSpec for one leaf: shard the LEADING dim over ``axis`` when
    the leaf is an expert stack (``expert_*`` name) divisible by the axis;
    replicate otherwise."""
    if (
        axis_size > 1
        and _leaf_name(path).startswith(EXPERT_PREFIX)
        and len(shape) >= 1
        and shape[0] >= axis_size
        and shape[0] % axis_size == 0
    ):
        return P(*([axis] + [None] * (len(shape) - 1)))
    return P()


def expert_partition_specs(tree, mesh: Mesh, axis: str = EXPERT_AXIS):
    """PartitionSpec tree for a params / optimizer-state pytree (per-leaf
    :func:`expert_spec`; moments land on their parameter's layout because
    the path rule sees the same parameter names)."""
    size = mesh.shape.get(axis, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, v: expert_spec(p, getattr(v, "shape", ()), size, axis),
        tree)


def expert_shardings(tree, mesh: Mesh, axis: str = EXPERT_AXIS):
    """NamedSharding tree (for ``jax.jit`` in_shardings / ``device_put``)."""
    size = mesh.shape.get(axis, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(
            mesh, expert_spec(p, getattr(v, "shape", ()), size, axis)),
        tree)


def shard_expert_params(tree, mesh: Mesh, axis: str = EXPERT_AXIS):
    """``device_put`` the tree with its expert shardings (host-side helper,
    used at init/restore so expert stacks arrive split, 1/N per device)."""
    return jax.device_put(tree, expert_shardings(tree, mesh, axis))


def validate_expert_composition(mesh_shape, *, context: str,
                                exc=NotImplementedError) -> None:
    """The 'expert' axis's mesh-composition rule (shared by the trainer's
    constructor — which runs before params exist — and
    :func:`validate_expert_mesh`): composes with ``'data'`` only."""
    if mesh_shape.get(EXPERT_AXIS, 1) <= 1:
        return
    for other in ("model", "pipe", "spatial", "seq"):
        if mesh_shape.get(other, 1) > 1:
            raise exc(
                f"'expert' composes with 'data' only; a '{other}' axis "
                f"cannot join an expert mesh ({context})")


def resolve_dispatch_impl(net) -> str | None:
    """The ONE accessor for a net's MoE dispatch implementation, used by
    every ``validate_expert_mesh`` caller. Top-level MoE nets expose
    ``dispatch_impl`` as a field; nets that embed :class:`ExpertChoiceMoE`
    (DRFNet/DRFSISRNet) expose it as a property. A net with expert params
    but no attribute returns None here, and ``validate_expert_mesh``
    refuses it loudly — so a future embedder cannot silently bypass the
    folded-dispatch (dense_nhwc) refusal by not plumbing the knob."""
    return getattr(net, "dispatch_impl", None)


def validate_expert_mesh(mesh: Mesh, params, *, context: str,
                         exc=NotImplementedError,
                         dispatch_impl: str | None = None) -> None:
    """The one place the 'expert' axis's composition and shardability
    rules live (used by the trainer's ``_place_state`` AND serving's
    ``make_pipeline``, so the two entry points cannot drift):

    - composes with ``'data'`` only (model would re-shard the expert
      stacks on a second axis; spatial/seq x expert is untested two-axis
      partitioner territory; pipe is a shard_map schedule);
    - the net must HAVE expert stacks, and every stack's leading
      ``num_experts`` dim must divide the axis size — anything else would
      silently replicate the whole mesh axis (the same no-silent-no-op
      rule as ``parse_mesh_axes``).
    """
    size = mesh.shape.get(EXPERT_AXIS, 1)
    if size <= 1:
        return
    validate_expert_composition(mesh.shape, context=context, exc=exc)
    stacks = [
        (path, leaf) for path, leaf in
        jax.tree_util.tree_leaves_with_path(params)
        if _leaf_name(path).startswith(EXPERT_PREFIX)
        and getattr(leaf, "ndim", 0) >= 1
    ]
    if not stacks:
        raise exc(
            "no expert-stacked params (expert_* leaves) — the 'expert' "
            f"mesh axis applies to MoE nets (e.g. MoEEDSRNet) ({context})")
    if dispatch_impl == "dense_nhwc":
        # dense_nhwc reshapes every expert's wi/wo into ONE conv kernel
        # (models/moe.py), so GSPMD would all-gather the full expert stacks
        # to every device each step — numerically correct but silently
        # defeating the per-expert-local schedule the axis exists for.
        raise exc(
            "dispatch_impl='dense_nhwc' folds all experts into replicated "
            "conv kernels and cannot run expert-parallel — use 'sparse' or "
            f"'dense' under an 'expert' mesh axis ({context})")
    if dispatch_impl is None:
        # Expert stacks with an undetermined dispatch implementation means
        # a net embedding MoE blocks without exposing ``dispatch_impl``
        # (see resolve_dispatch_impl) — refuse rather than assume: a folded
        # dispatch would silently defeat the axis, the exact no-op this
        # validator exists to catch.
        raise exc(
            f"{context}: the net carries expert-stacked params but does "
            "not expose 'dispatch_impl' — nets embedding MoE blocks must "
            "surface the knob (a property is enough; see DRFNet) so the "
            "'expert' axis can refuse folded dispatch implementations")
    for path, leaf in stacks:
        if leaf.shape[0] < size or leaf.shape[0] % size:
            raise exc(
                f"expert stack {_leaf_name(path)!r} has num_experts="
                f"{leaf.shape[0]}, not divisible by the 'expert' axis "
                f"({size}) — the axis would silently replicate "
                f"({context})")
