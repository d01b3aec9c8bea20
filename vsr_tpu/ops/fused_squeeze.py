"""Pallas TPU kernel: fused concat + 1x1-conv squeeze.

The FBlock dense ladders (SRFBN / DRFSISR / DRFNet, ``feedback.py``)
repeatedly concatenate their growing feature lists and feed each concat to
a 1x1 squeeze conv. On the XLA path the concatenation materializes in HBM
(write sum(C) bytes) and the conv reads it back (another sum(C)) — the
round-3 serving traces put this at 25% of SRFBN/DRFSISR device time with
the 1x1-at-HR convs themselves bandwidth-bound (16-32 TF/s at 300-575
GB/s).

This kernel computes ``concat(xs, -1) @ W + b`` WITHOUT materializing the
concat: each grid step DMAs one row-tile of every input into VMEM, joins
them there (VMEM bandwidth, not HBM), and runs ONE MXU contraction with
the full K = sum(C) — better MXU utilization than the K=64 per-part dots
of the concat-split rewrite (round-2: 0.83x) and none of the concat
traffic. HBM cost: read each input once + write the output once.

Inputs keep the conv's parameter layout: ``kernel`` is the squeeze conv's
``(1, 1, sum(C), F)`` kernel reshaped to ``(sum(C), F)`` — checkpoints and
weight transplants are untouched.

The op is differentiable via custom_vjp with an XLA backward (training
uses it too; the backward is plain matmuls over per-input slices of W).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 1024  # rows per grid step (flattened batch*spatial)


def _kernel(*refs):
    """refs = (x_0, ..., x_{k-1}, w, b, out). Joins the x tiles in VMEM and
    contracts against the full-K weight on the MXU."""
    xs = refs[:-3]
    w_ref, b_ref, out_ref = refs[-3:]
    joined = jnp.concatenate([x[:] for x in xs], axis=-1)
    acc = jnp.dot(joined, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (acc + b_ref[0, :].astype(jnp.float32)).astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def concat_matmul(xs: tuple, kernel: jnp.ndarray, bias: jnp.ndarray):
    """``concat(xs, -1) @ kernel + bias`` without materializing the concat.

    xs: tuple of (..., C_i) arrays sharing leading dims; kernel
    ``(sum(C_i), F)``; bias ``(F,)``. Returns (..., F) in the xs dtype.
    """
    return _concat_matmul_fwd_impl(xs, kernel, bias)


def _concat_matmul_fwd_impl(xs, kernel, bias):
    lead = xs[0].shape[:-1]
    m = int(np.prod(lead))
    f = kernel.shape[-1]
    dtype = xs[0].dtype
    flat = [x.reshape(m, x.shape[-1]) for x in xs]
    pad = (-m) % TILE_M
    if pad:
        flat = [jnp.pad(x, ((0, pad), (0, 0))) for x in flat]
    mp = m + pad
    grid = (mp // TILE_M,)

    in_specs = [
        pl.BlockSpec((TILE_M, x.shape[-1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for x in flat
    ] + [
        pl.BlockSpec((kernel.shape[0], f), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE_M, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, f), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kernel.shape[0] * f,
            bytes_accessed=sum(x.size * x.dtype.itemsize for x in flat)
            + mp * f * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        # Mosaic is TPU-only; tests and CPU runs use the interpreter.
        interpret=jax.devices()[0].platform != "tpu",
    )(*flat, kernel.astype(dtype), bias.astype(dtype).reshape(1, f))
    return out[:m].reshape(*lead, f)


def _fwd(xs, kernel, bias):
    return _concat_matmul_fwd_impl(xs, kernel, bias), (xs, kernel)


def _bwd(res, g):
    xs, kernel = res
    lead = xs[0].shape[:-1]
    m = int(np.prod(lead))
    gf = g.reshape(m, g.shape[-1]).astype(jnp.float32)
    # Per-input slices of the weight give the input grads; the weight grad
    # is the blockwise concat(x)^T @ g — all plain XLA matmuls.
    dxs = []
    dws = []
    off = 0
    for x in xs:
        c = x.shape[-1]
        wi = kernel[off:off + c].astype(jnp.float32)
        dxs.append((gf @ wi.T).astype(x.dtype).reshape(x.shape))
        xf = x.reshape(m, c).astype(jnp.float32)
        dws.append(xf.T @ gf)
        off += c
    dw = jnp.concatenate(dws, axis=0).astype(kernel.dtype)
    db = jnp.sum(gf, axis=0).astype(kernel.dtype)
    return tuple(dxs), dw, db


concat_matmul.defvjp(_fwd, _bwd)
