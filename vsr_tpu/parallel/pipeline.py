"""GPipe-style pipeline parallelism over a ``'pipe'`` mesh axis.

The reference framework is single-GPU (SURVEY.md §2.9 — no parallelism);
this module is the TPU-native pipeline-parallel capability for the deep
residual-chain nets (``/root/reference/src/model/nets/edsr_net.py:30-36``:
head conv -> N identical resblocks -> tail, and this framework's 3D twin
``Volume3DSRNet``): the resblock chain is cut into
``P = mesh.shape['pipe']`` stages (each device holds ``N/P`` stacked
blocks), the batch is split into ``M`` microbatches, and a ``lax.scan``
over ``M + P - 1`` ticks streams activations stage to stage with
``jax.lax.ppermute`` over ICI — the classic GPipe schedule with a
``(P-1)/(M+P-1)`` bubble, written as SPMD code under ``shard_map``.

Exactness: every stage calls the net's OWN flax submodules on re-rooted
subtrees of the standard parameter tree, so the pipelined forward is the
sequential forward up to float reassociation — checkpoints interoperate
unchanged (each net's ``split``/``merge`` are exact inverses).

SPMD caveat (documented, inherent to the uniform-program formulation): the
thin head conv runs masked on every stage each tick, and the tail (applied
ONCE, batched over the M valid microbatches after the tick loop) runs
masked on every stage; the resblock chain — where the FLOPs live — is what
actually partitions. Use ``'pipe'`` when one chip cannot hold the
model+activations of a very deep chain; for throughput on small nets
prefer ``'data'``/``'spatial'``.

Composes with data parallelism: a ``{'data': d, 'pipe': p}`` mesh shards
the batch over ``'data'`` outside the pipeline (each data row runs its own
pipeline over its batch shard) and grads psum across both axes through
``shard_map`` autodiff.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from vsr_tpu.models.common import Conv, Conv3D, ShuffleConv
from vsr_tpu.models.edsr import EDSRNet, _ResBlock, _UpBlock
from vsr_tpu.models.vol3d import (Volume3DSRNet, _ResBlock3D,
                                  _pixel_shuffle_2d_in_3d)

#: The reserved mesh-axis name for pipeline (stage) sharding.
PIPE_AXIS = "pipe"


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """How to run one net as a head -> stacked-blocks -> tail chain.

    ``head.apply(head_p, x) -> h`` produces both the stage-0 activation and
    the global-skip carry; ``block.apply({'params': bp}, h) -> h`` is one
    resblock; ``tail.apply(tail_p, body, skip) -> y`` closes the global
    skip and upsamples. ``split(params) -> (head_p, stacked, tail_p)`` and
    ``merge`` are exact inverses on the net's standard parameter tree
    (``stacked`` stacks the per-block subtrees on a new leading axis — the
    pipeline-stage shard axis).
    """

    head: nn.Module
    block: nn.Module
    tail: nn.Module
    num_blocks: int
    split: Callable[[Any], tuple]
    merge: Callable[[Any, Any, Any], Any]


class _Head(nn.Module):
    """EDSR head conv as a standalone module (params re-rooted from the
    net's ``Conv_0`` subtree — same submodule class, same math)."""

    num_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.num_features, 3, padding=1, dtype=self.dtype)(x)


class _Tail(nn.Module):
    """EDSR tail (body conv + global skip -> upsampling ladder -> shuffle
    conv), params re-rooted from the net's ``Conv_1 / _UpBlock_0 /
    ShuffleConv_0`` subtrees."""

    num_features: int
    out_channels: int
    upscale_factor: int
    fused_tail: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, body, skip):
        body = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(body)
        body = body + skip
        pre = _UpBlock(self.num_features, self.upscale_factor,
                       dtype=self.dtype)(body)
        return ShuffleConv(self.out_channels, 3,
                           factor=_UpBlock.split(self.upscale_factor),
                           fused=self.fused_tail, dtype=self.dtype)(pre)


def split_edsr_params(params, num_resblocks: int):
    """Standard ``EDSRNet`` param tree -> ``(head, stacked_blocks, tail)``."""
    p = params["params"]
    blocks = [p[f"_ResBlock_{i}"] for i in range(num_resblocks)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    head = {"params": {"Conv_0": p["Conv_0"]}}
    tail = {"params": {"Conv_0": p["Conv_1"], "_UpBlock_0": p["_UpBlock_0"],
                       "ShuffleConv_0": p["ShuffleConv_0"]}}
    return head, stacked, tail


def merge_edsr_params(head, stacked, tail):
    """Exact inverse of :func:`split_edsr_params` (checkpoint interop)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    num = int(leaves[0].shape[0])
    p = {"Conv_0": head["params"]["Conv_0"],
         "Conv_1": tail["params"]["Conv_0"],
         "_UpBlock_0": tail["params"]["_UpBlock_0"],
         "ShuffleConv_0": tail["params"]["ShuffleConv_0"]}
    for i in range(num):
        p[f"_ResBlock_{i}"] = jax.tree_util.tree_map(
            lambda v, i=i: v[i], stacked)
    return {"params": p}


class _Head3D(nn.Module):
    """``Volume3DSRNet`` head conv (re-rooted ``Conv3D_0`` subtree)."""

    num_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                      dtype=self.dtype)(x)


class _Tail3D(nn.Module):
    """``Volume3DSRNet`` tail: body conv + global skip -> in-plane
    sub-pixel ladder -> final conv (vol3d.py:64-78), params re-rooted from
    the net's ``Conv3D_1..k`` subtrees."""

    num_features: int
    out_channels: int
    upscale_factor: int
    dtype: Any = None

    @nn.compact
    def __call__(self, body, skip):
        f = self.upscale_factor
        body = Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                      dtype=self.dtype)(body) + skip
        if math.log2(f).is_integer():
            for _ in range(int(math.log2(f))):
                body = Conv3D(4 * self.num_features, (3, 3, 3),
                              padding=(1, 1, 1), dtype=self.dtype)(body)
                body = _pixel_shuffle_2d_in_3d(body, 2)
        elif f == 3:
            body = Conv3D(9 * self.num_features, (3, 3, 3),
                          padding=(1, 1, 1), dtype=self.dtype)(body)
            body = _pixel_shuffle_2d_in_3d(body, 3)
        else:  # pragma: no cover - rejected by the net itself
            raise NotImplementedError(f"upscale_factor={f}")
        return Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                      dtype=self.dtype)(body)


def split_vol3d_params(params, num_resblocks: int):
    """``Volume3DSRNet`` tree -> ``(head, stacked_blocks, tail)``: the
    net's ``Conv3D_{i>=1}`` renumber to the tail's ``Conv3D_{i-1}``."""
    p = params["params"]
    blocks = [p[f"_ResBlock3D_{i}"] for i in range(num_resblocks)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    head = {"params": {"Conv3D_0": p["Conv3D_0"]}}
    n_convs = sum(1 for k in p if k.startswith("Conv3D_"))
    tail = {"params": {f"Conv3D_{i - 1}": p[f"Conv3D_{i}"]
                       for i in range(1, n_convs)}}
    return head, stacked, tail


def merge_vol3d_params(head, stacked, tail):
    """Exact inverse of :func:`split_vol3d_params`."""
    leaves = jax.tree_util.tree_leaves(stacked)
    num = int(leaves[0].shape[0])
    p = {"Conv3D_0": head["params"]["Conv3D_0"]}
    for k, v in tail["params"].items():
        p[f"Conv3D_{int(k.split('_')[1]) + 1}"] = v
    for i in range(num):
        p[f"_ResBlock3D_{i}"] = jax.tree_util.tree_map(
            lambda v, i=i: v[i], stacked)
    return {"params": p}


def chain_spec(net: nn.Module) -> ChainSpec:
    """The :class:`ChainSpec` for ``net``, or ``NotImplementedError`` for
    nets without a head -> identical-blocks -> tail chain (recurrent /
    feedback zoo members cannot GPipe over their time dependency)."""
    if isinstance(net, EDSRNet):
        return ChainSpec(
            head=_Head(net.num_features, dtype=net.dtype),
            block=_ResBlock(net.num_features, net.res_scale, dtype=net.dtype),
            tail=_Tail(net.num_features, net.out_channels, net.upscale_factor,
                       fused_tail=net.fused_tail, dtype=net.dtype),
            num_blocks=net.num_resblocks,
            split=lambda p: split_edsr_params(p, net.num_resblocks),
            merge=merge_edsr_params,
        )
    if isinstance(net, Volume3DSRNet):
        return ChainSpec(
            head=_Head3D(net.num_features, dtype=net.dtype),
            block=_ResBlock3D(net.num_features, net.res_scale,
                              dtype=net.dtype),
            tail=_Tail3D(net.num_features, net.out_channels,
                         net.upscale_factor, dtype=net.dtype),
            num_blocks=net.num_resblocks,
            split=lambda p: split_vol3d_params(p, net.num_resblocks),
            merge=merge_vol3d_params,
        )
    raise NotImplementedError(
        "pipeline parallelism covers the residual-chain nets "
        f"(EDSRNet, Volume3DSRNet); got {type(net).__name__}")


def make_pipelined_apply(net: nn.Module, mesh: Mesh, num_microbatches: int,
                         axis: str = PIPE_AXIS):
    """Build ``apply(params, x)`` == ``net.apply(params, x)`` (up to float
    reassociation), pipelined over the ``axis`` stages of ``mesh``.

    ``params`` is the net's standard tree; ``x``: (N, ...) with ``N``
    divisible by ``num_microbatches`` times the ``'data'`` axis size (when
    the mesh has one). ``net.num_resblocks`` must divide evenly into the
    stage count.
    """
    spec = chain_spec(net)
    stages = mesh.shape[axis]
    if spec.num_blocks % stages != 0:
        raise ValueError(
            f"num_resblocks={spec.num_blocks} does not split over "
            f"'{axis}'={stages} stages")
    M = int(num_microbatches)
    if M < 1:
        raise ValueError(f"num_microbatches must be >= 1, got {M}")
    head_mod, block_mod, tail_mod = spec.head, spec.block, spec.tail
    data = mesh.shape.get("data", 1)

    def per_device(x, head_p, my_blocks, tail_p):
        rank = jax.lax.axis_index(axis)
        n = x.shape[0]
        assert n % M == 0, (n, M)  # apply() validated divisibility
        mb = n // M
        xs = x.reshape(M, mb, *x.shape[1:])

        def run_blocks(h, bp):
            return block_mod.apply({"params": bp}, h), None

        perm = [(i, i + 1) for i in range(stages - 1)]

        def tick(carry, t):
            act, skip = carry
            # Stage-0 injection: the t-th microbatch through the head conv.
            # (Computed masked on every stage — SPMD uniform program; the
            # head is genuinely thin. The TAIL is applied OUTSIDE this loop
            # on the collected valid outputs only — per-tick tails would
            # run the HR upsampling ladder M+P-1 times per device instead
            # of once on the M valid microbatches.)
            inj = head_mod.apply(head_p, xs[jnp.minimum(t, M - 1)])
            is_first = (rank == 0)
            act_in = jnp.where(is_first, inj, act)
            skip_in = jnp.where(is_first, inj, skip)
            out = jax.lax.scan(run_blocks, act_in, my_blocks)[0]
            if stages > 1:
                act_next = jax.lax.ppermute(out, axis, perm)
                skip_next = jax.lax.ppermute(skip_in, axis, perm)
            else:
                act_next, skip_next = out, skip_in
            return (act_next, skip_next), (out, skip_in)

        carry_sd = jax.eval_shape(
            head_mod.apply, head_p,
            jax.ShapeDtypeStruct(xs.shape[1:], x.dtype))
        zero = jnp.zeros(carry_sd.shape, carry_sd.dtype)
        init = (zero, zero)
        _, (outs, skips) = jax.lax.scan(
            tick, init, jnp.arange(M + stages - 1))
        # Completed microbatches leave the LAST stage at ticks
        # P-1 .. P-2+M (on earlier stages these slots hold intermediates —
        # masked to zero below, so the psum that replicates the result
        # across the pipe axis adds exact zeros). One batched tail apply
        # over all M valid microbatches.
        outs = outs[stages - 1:].reshape(M * mb, *outs.shape[2:])
        skips = skips[stages - 1:].reshape(M * mb, *skips.shape[2:])
        y = tail_mod.apply(tail_p, outs, skips)
        y = jnp.where(rank == stages - 1, y, jnp.zeros_like(y))
        return jax.lax.psum(y, axis)

    x_spec = P("data") if data > 1 else P()
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(x_spec, P(), P(axis), P()),
        out_specs=x_spec,
        check_vma=False,
    )

    def apply(params, x):
        per = data * M
        if x.shape[0] % per != 0:
            raise ValueError(
                f"batch size {x.shape[0]} is not divisible by "
                f"data_axis*num_microbatches = {data}*{M}")
        head_p, stacked, tail_p = spec.split(params)
        return sharded(x, head_p, stacked, tail_p)

    # Callers (the trainer's _apply hook) fall back to the sequential
    # net.apply — same math — for batches that do not divide this.
    apply.batch_multiple = data * M
    return apply


def make_pipelined_train_step(net: nn.Module, mesh: Mesh, tx,
                              num_microbatches: int, loss_fn,
                              axis: str = PIPE_AXIS):
    """jitted ``step(params, opt_state, inputs, targets) -> (params,
    opt_state, loss)`` where the forward/backward runs the GPipe schedule.

    ``loss_fn(output, target) -> scalar``; grads flow through the
    ``shard_map`` (ppermute transposes to the reverse permute, the psum
    replication to a broadcast), so the step matches the sequential one up
    to reassociation.
    """
    apply = make_pipelined_apply(net, mesh, num_microbatches, axis=axis)

    @jax.jit
    def step(params, opt_state, inputs, targets):
        def loss(p):
            return loss_fn(apply(p, inputs), targets)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state2 = tx.update(grads["params"],
                                        opt_state, params["params"])
        import optax

        params2 = {**params,
                   "params": optax.apply_updates(params["params"], updates)}
        return params2, opt_state2, l

    return step
