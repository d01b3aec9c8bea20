"""Deformable convolution v1/v2 — TPU-native replacement for the reference
CUDA extension.

The reference implements DCN as ~1.6k lines of C++/CUDA
(``/root/reference/src/model/nets/edvr_net/dcn/``): an offset-driven
bilinear-gather im2col kernel, a grouped GEMM, and three hand-written
backward kernels (col2im, col2im_coord, weight grad). On TPU the same
computation decomposes into:

- a batched bilinear gather per kernel tap (XLA gather + lerp — the
  irregular-memory part),
- one ``einsum`` contraction over (taps x channels) that lowers to a single
  MXU GEMM,
- and **autodiff through the gather**, which produces exactly the
  scatter-add col2im / col2im_coord backward passes the CUDA kernels
  hand-code — no custom_vjp needed for correctness.

Both variants are provided: v1 (offset only, ``deform_conv_cuda.cpp:151``)
and v2 (modulated: offset + mask, ``:486``). Layout is channels-last;
offsets are ``(N, Ho, Wo, dg, k*k, 2)`` with ``[..., 0]=dy, [..., 1]=dx``
(the reference's channel-packed layout unpacked into named axes), and
channels within a deformable group share offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsr_tpu.ops.warp import grid_sample_bilinear


def _sample_taps(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    kernel: tuple[int, int],
    stride: int,
    padding: int,
    dilation: int,
) -> jnp.ndarray:
    """Offset-driven bilinear im2col.

    x: (N, H, W, C); offsets: (N, Ho, Wo, dg, k2, 2).
    Returns (N, Ho, Wo, k2, C) sampled taps (zero outside).
    """
    n, h, w, c = x.shape
    kh, kw = kernel
    n_, ho, wo, dg, k2, _ = offsets.shape
    assert k2 == kh * kw and n_ == n
    cg = c // dg

    # Per-group images flattened into the batch dim for one gather per tap.
    xg = x.reshape(n, h, w, dg, cg)
    xg = jnp.moveaxis(xg, 3, 0).reshape(dg * n, h, w, cg)

    base_y = (jnp.arange(ho, dtype=x.dtype) * stride - padding).reshape(1, ho, 1, 1)
    base_x = (jnp.arange(wo, dtype=x.dtype) * stride - padding).reshape(1, 1, wo, 1)

    taps = []
    for ky in range(kh):
        for kx in range(kw):
            t = ky * kw + kx
            gy = base_y + ky * dilation + offsets[..., t, 0]  # (N, Ho, Wo, dg)
            gx = base_x + kx * dilation + offsets[..., t, 1]
            gy = jnp.moveaxis(gy, 3, 0).reshape(dg * n, ho, wo)
            gx = jnp.moveaxis(gx, 3, 0).reshape(dg * n, ho, wo)
            s = grid_sample_bilinear(xg, gy, gx, padding_mode="zeros")
            s = jnp.moveaxis(s.reshape(dg, n, ho, wo, cg), 0, 3)  # (N,Ho,Wo,dg,cg)
            taps.append(s.reshape(n, ho, wo, c))
    return jnp.stack(taps, axis=3)  # (N, Ho, Wo, k2, C)


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable conv: v1 when ``mask is None``, modulated v2 otherwise.

    weight: (kh, kw, Cin, Cout) (flax layout); mask: (N, Ho, Wo, dg, k2).
    """
    kh, kw, cin, cout = weight.shape
    col = _sample_taps(x, offsets, (kh, kw), stride, padding, dilation)
    if mask is not None:
        n, ho, wo, dg, k2 = mask.shape
        cg = cin // dg
        m = jnp.repeat(mask, cg, axis=3)  # (N,Ho,Wo,C,k2) ordered dg-major
        # mask layout must match col channel order (dg, cg): repeat on dg axis
        # after moving k2 forward.
        m = jnp.moveaxis(m, 4, 3)  # (N, Ho, Wo, k2, C)
        col = col * m
    out = jnp.einsum(
        "nhwkc,kco->nhwo",
        col,
        weight.reshape(kh * kw, cin, cout),
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias
    return out
