"""Pallas TPU kernel: fused DUF dynamic-filter application.

Fuses, per output row-tile, what the XLA path does in three HBM round trips
(materialized im2col patches -> softmax -> einsum):

    out[y, x, dy*r+dx] = sum_k softmax_k(logits[y, x, :, dy*r+dx])
                          * x[y + ky - p, x + kx - p]

The im2col uses shifted slices of the zero-padded input frame held in VMEM
(one cardiac frame is ~50 KB), so there is no gather; the softmax over the
k^2 tap axis and the per-pixel (k^2 x r^2) contraction happen in-register.

Layout: W is the lane (minor) dimension throughout — logits enter the kernel
as (N, H, k2*r2, W) so the tiny tap/sub-pixel axes live on sublanes instead
of being padded to 128 lanes (which would inflate VMEM 32x). Channels C=1
(the cardiac data); the general-C path stays on XLA in
``vsr_tpu.ops.dynamic_filter``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsr_tpu.ops.pixel_shuffle import pixel_shuffle


def _duf_kernel(x_ref, logits_ref, out_ref, *, size: int, r2: int, tile_h: int, w: int):
    j = pl.program_id(1)
    row0 = j * tile_h
    k2 = size * size
    # x_ref: (1, H+2p, W+2p); logits_ref: (1, tile_h, k2*r2, w);
    # out_ref: (1, tile_h, r2, w).
    logits = logits_ref[0].reshape(tile_h, k2, r2, w)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)  # (tile_h, k2, r2, w)

    acc = jnp.zeros((tile_h, r2, w), dtype=jnp.float32)
    for ky in range(size):
        for kx in range(size):
            tap = ky * size + kx
            patch = x_ref[0, pl.ds(row0 + ky, tile_h), pl.ds(kx, w)]
            acc = acc + patch[:, None, :] * probs[:, tap, :, :]
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("size", "upscale"))
def duf_dynamic_filter_pallas(x, logits, size: int, upscale: int):
    """x: (N, H, W) float32; logits: (N, H, W, k^2, r^2) *pre-softmax*.

    Returns (N, H*r, W*r) — softmax + filtering + pixel shuffle fused.
    """
    n, h, w = x.shape
    k2 = size * size
    r2 = upscale * upscale
    assert logits.shape == (n, h, w, k2, r2), logits.shape
    pad = size // 2
    x_padded = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad)))
    # (N, H, W, k2, r2) -> (N, H, k2*r2, W): W becomes the lane dim.
    logits_l = jnp.transpose(logits.astype(jnp.float32), (0, 1, 3, 4, 2)).reshape(
        n, h, k2 * r2, w
    )

    tile_h = 8 if h % 8 == 0 else h
    grid = (n, h // tile_h)

    out = pl.pallas_call(
        functools.partial(_duf_kernel, size=size, r2=r2, tile_h=tile_h, w=w),
        grid=grid,
        in_specs=[
            # Whole padded frame per batch element (same block for every j).
            pl.BlockSpec((1, h + 2 * pad, w + 2 * pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, k2 * r2, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, r2, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, r2, w), jnp.float32),
    )(x_padded, logits_l)
    # (N, H, r2, W) -> (N, H, W, r2) -> pixel shuffle to (N, H*r, W*r).
    out = jnp.transpose(out, (0, 1, 3, 2))
    return pixel_shuffle(out, upscale)[..., 0]
