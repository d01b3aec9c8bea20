"""Spatial sharding of convolutions with halo exchange.

The TPU-native analogue of sequence/context parallelism for this workload
(SURVEY.md §5): large 2D(+t) volumes are sharded along H across a
``'spatial'`` mesh axis; each device convolves its slab after exchanging
``halo`` boundary rows with its neighbors over ICI (``jax.lax.ppermute``).
Global edges are zero-padded, so a k=3 SAME conv on the sharded array is
bitwise the computation of the unsharded conv.

``halo_exchange`` supports halo fusion: exchanging ``k`` rows once covers a
chain of ``k`` 3x3 VALID convs without further communication — the standard
way to amortize boundary traffic across a residual block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, axis: int = 1):
    """Pad a sharded axis with ``halo`` rows from each neighbor (zeros at the
    global boundary). ``x`` is the per-device shard, axis is the sharded dim.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (halo, halo)
        return jnp.pad(x, pad)

    def take(arr, start, size):
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return arr[tuple(idx)]

    top_edge = take(x, 0, halo)          # rows a neighbor below needs
    bottom_edge = take(x, -halo, halo)   # rows a neighbor above needs
    # Send bottom edge down (i -> i+1): received as the top halo.
    from_prev = jax.lax.ppermute(
        bottom_edge, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    # Send top edge up (i -> i-1): received as the bottom halo.
    from_next = jax.lax.ppermute(
        top_edge, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    # Ranks with no source receive zeros from ppermute — exactly the global
    # zero padding a SAME conv needs.
    return jnp.concatenate([from_prev, x, from_next], axis=axis)


def conv2d_same_sharded(x, kernel, axis_name: str):
    """Per-shard body: SAME 3x3-style conv on an H-sharded (N, H, W, C)
    array. The W axis uses ordinary SAME padding; the H axis pads via halo
    exchange. ``kernel``: (kh, kw, Cin, Cout), odd kh/kw."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    x = halo_exchange(x, kh // 2, axis_name, axis=1)
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1),
        padding=[(0, 0), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_spatial_conv(mesh: Mesh, n_layers: int = 1, axis_name: str = "spatial"):
    """jit-ed SPMD function applying ``n_layers`` SAME convs (relu between)
    to an H-sharded input, with one fused halo exchange."""

    def body(x, kernels):
        kh = kernels[0].shape[0]
        halo = (kh // 2) * len(kernels)
        x = halo_exchange(x, halo, axis_name, axis=1)
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        remaining = halo
        for i, k in enumerate(kernels):
            kw = k.shape[1]
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1),
                padding=[(0, 0), (kw // 2, kw // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            remaining -= k.shape[0] // 2
            if i + 1 < len(kernels):
                # Chained SAME-conv semantics: rows that lie beyond the
                # global boundary must be zero before the next layer (only
                # the first/last shard carries such rows).
                rows = jnp.arange(x.shape[1])
                top_bad = (idx == 0) & (rows < remaining)
                bot_bad = (idx == n - 1) & (rows >= x.shape[1] - remaining)
                mask = ~(top_bad | bot_bad)
                x = x * mask[None, :, None, None].astype(x.dtype)
                x = jax.nn.relu(x)
        return x

    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)
