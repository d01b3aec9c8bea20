"""Dynamic (per-pixel) upsampling filters — the DUF hot op.

``apply_dynamic_filters(x, filters, upscale)`` computes, for every output
pixel, a learned k x k filter applied to the LR neighborhood:

    out[n, y*r+dy, x*r+dx, c] = sum_{ij} f[n, y, x, ij, dy*r+dx] *
                                patch_ij(x)[n, y, x, c]

The reference implements this with an identity-kernel im2col conv + matmul
(``duf_net.py:74-91``). Here the im2col is ``lax.conv_general_dilated_
patches`` and the per-pixel contraction one einsum — XLA fuses it into a
single batched GEMM on the MXU. (A hand-written Pallas kernel fusing the
softmax with the contraction is a possible future win; profiles show the
einsum already lowers well.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsr_tpu.ops.pixel_shuffle import pixel_shuffle


def extract_patches(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W, C, size^2) patches, zero-padded SAME."""
    n, h, w, c = x.shape
    pad = size // 2
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(size, size),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv_general_dilated_patches returns channels ordered (C, kh, kw).
    return patches.reshape(n, h, w, c, size * size)


def apply_dynamic_filters(
    x: jnp.ndarray, filters: jnp.ndarray, upscale: int
) -> jnp.ndarray:
    """x: (N, H, W, C); filters: (N, H, W, k^2, r^2) (already softmaxed).

    Returns (N, H*r, W*r, C).
    """
    k2 = filters.shape[3]
    size = int(round(k2**0.5))
    patches = extract_patches(x, size)  # (N, H, W, C, k^2)
    out = jnp.einsum("nhwck,nhwkr->nhwrc", patches, filters)
    n, h, w, r2, c = out.shape
    out = out.reshape(n, h, w, r2 * c)
    # pixel_shuffle expects channel layout (c_out, dy, dx); ours is
    # (dy*dx, c) -> reorder to (c, dy*dx).
    out = out.reshape(n, h, w, r2, c).transpose(0, 1, 2, 4, 3).reshape(n, h, w, c * r2)
    return pixel_shuffle(out, upscale)
