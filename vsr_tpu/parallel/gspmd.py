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
    model_axis: str | None = None,
    zero_axis: str | None = None,
    fsdp_axis: str | None = None,
    expert_axis: str | None = None,
):
    """jit ``step_fn(params, opt_state, inputs, targets)`` with the given
    input/target PartitionSpec trees.

    Params/opt_state are replicated unless:

    - ``model_axis`` names a mesh axis (tensor parallelism): each of their
      leaves shards its trailing output-feature dim over that axis per
      :func:`vsr_tpu.parallel.tp.model_spec`;
    - ``zero_axis`` names a mesh axis (ZeRO-1 optimizer-state sharding):
      only the OPTIMIZER moments shard their trailing dims over that axis
      (typically ``'data'``) while the params stay replicated — the
      partitioner turns the update into reduce-scatter(grads) ->
      shard-local moment update -> all-gather(new params), so per-device
      HBM holds 1/N of the moments instead of full copies;
    - ``fsdp_axis`` names a mesh axis (ZeRO-3 / fully-sharded data
      parallelism): params AND moments shard their trailing dims over that
      axis (typically ``'data'``, the same axis that shards the batch) and
      STAY sharded between steps — the partitioner all-gathers each
      parameter at its use sites in forward/backward and reduce-scatters
      the gradients straight into the shard-local update, so per-device
      HBM never holds a full replicated copy of either tree;
    - ``expert_axis`` names a mesh axis (expert parallelism): every
      expert-stacked leaf (``expert_*`` name, leading dim = num_experts)
      shards its LEADING dim over that axis per
      :func:`vsr_tpu.parallel.ep.expert_spec`, all other leaves stay
      replicated; the MoE layers' sharding constraints
      (:func:`vsr_tpu.parallel.ep.constrain_expert_dim`, activated here via
      :func:`vsr_tpu.parallel.ep.use_mesh`) keep each expert's compute on
      its devices (combine all-reduced over the axis — see ep.py).

    The four are mutually exclusive parameter-placement rules (``model`` /
    ``fsdp`` would re-shard the expert stacks on a second axis — untested
    two-axis partitioner territory, see ``tp.reject_spatial_x_model`` for
    the precedent). All are per-leaf rules, so the jit is built lazily on
    the first call, when the actual leaf shapes are in hand.
    """
    rep = NamedSharding(mesh, P())
    donate_argnums = (0, 1) if donate else ()
    io = (_shardings(mesh, input_spec), _shardings(mesh, target_spec))
    use_model = bool(model_axis) and mesh.shape.get(model_axis, 1) > 1
    use_zero = bool(zero_axis) and mesh.shape.get(zero_axis, 1) > 1
    use_fsdp = bool(fsdp_axis) and mesh.shape.get(fsdp_axis, 1) > 1
    use_expert = bool(expert_axis) and mesh.shape.get(expert_axis, 1) > 1
    if sum((use_model, use_zero, use_fsdp, use_expert)) > 1:
        raise NotImplementedError(
            "model_axis / zero_axis / fsdp_axis / expert_axis are mutually "
            "exclusive parameter/optimizer placement rules")
    if not (use_model or use_zero or use_fsdp or use_expert):
        return jax.jit(step_fn, in_shardings=(rep, rep) + io,
                       donate_argnums=donate_argnums)

    if use_expert:
        from vsr_tpu.parallel.ep import expert_shardings as _shard_rule
        from vsr_tpu.parallel.ep import use_mesh as _trace_ctx
        p_axis = o_axis = expert_axis
    else:
        import contextlib

        from vsr_tpu.parallel.tp import model_shardings as _shard_rule

        def _trace_ctx(_mesh):
            return contextlib.nullcontext()

        p_axis = model_axis if use_model else (fsdp_axis if use_fsdp else None)
        o_axis = p_axis if p_axis else zero_axis

    def pinned(params, opt_state, inputs, targets):
        # Pin the returned params/opt_state to the input layout so the
        # donated buffers match and the next call never reshards.
        with _trace_ctx(mesh):
            p, o, scalars, outputs = step_fn(params, opt_state, inputs,
                                             targets)
        if p_axis:
            p = jax.lax.with_sharding_constraint(
                p, _shard_rule(p, mesh, p_axis))
        else:
            # ZeRO: the partitioner would otherwise leave the updated
            # params sharded like the moments — pin the all-gather here so
            # callers always see replicated params.
            p = jax.lax.with_sharding_constraint(
                p, jax.tree_util.tree_map(lambda _: rep, p))
        o = jax.lax.with_sharding_constraint(
            o, _shard_rule(o, mesh, o_axis))
        return p, o, scalars, outputs

    cache: dict = {}

    def call(params, opt_state, inputs, targets):
        if "jit" not in cache:
            p_sh = (_shard_rule(params, mesh, p_axis)
                    if p_axis else rep)
            cache["jit"] = jax.jit(
                pinned,
                in_shardings=(p_sh,
                              _shard_rule(opt_state, mesh, o_axis)) + io,
                donate_argnums=donate_argnums,
            )
        return cache["jit"](params, opt_state, inputs, targets)

    return call
