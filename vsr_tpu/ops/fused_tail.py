"""Fold a SAME conv THROUGH a preceding pixel-shuffle.

The sub-pixel tails of the SR nets (conv -> pixel_shuffle(r) -> final conv)
materialize an (rH, rW, C) activation whose only consumer is a thin final
conv; on TPU that intermediate costs XLA layout copies (~11% of EDSR serving
time in the trace, BENCH.md) and the final conv runs at 1/128 output-lane
utilization. Because pixel-shuffle is a fixed permutation, the final conv
can be folded through it exactly:

    out(r*y+py, r*x+px, o)
      = b_o + sum_{dy,dx,c} W[dy,dx,c,o] * shuffled(r*y+py+dy, r*x+px+dx, c)
      = b_o + sum_{qy,qx,u} K[qy,qx,u,o*r^2+py*r+px] * pre(y+qy, x+qx, u)

with (qy, ry) = divmod(py+dy, r) and u = c*r^2 + ry*r + rx — i.e. ONE conv
on the PRE-shuffle array producing r^2 phase channels per output channel,
followed by a pixel-shuffle of the tiny (Cout*r^2)-channel result. Measured
on the chip: EDSR x2 serving 11.2 -> 12.2 vol/s (+8.6%); max fp32 deviation
~1e-5 (pure float reassociation).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def fused_extent(kernel_size: int, factor: int) -> int:
    """Coarse-grid kernel extent of the folded conv (odd, symmetric)."""
    half = kernel_size // 2
    qmax = max(abs((0 - half) // factor), (factor - 1 + half) // factor)
    return 2 * qmax + 1


def fuse_conv_through_shuffle(kernel: jnp.ndarray, bias: jnp.ndarray | None,
                              factor: int):
    """Rearrange a (k, k, Cin, Cout) SAME-conv kernel that runs AFTER
    pixel_shuffle(factor) into a (kq, kq, Cin*r^2, Cout*r^2) kernel that runs
    BEFORE it. Returns (K, B); apply as
    ``pixel_shuffle(conv(pre, K, SAME) + B, factor)``.

    Channel packing matches ops.pixel_shuffle: input u = c*r^2 + ry*r + rx,
    output v = o*r^2 + py*r + px.
    """
    k = kernel.shape[0]
    cin, cout = kernel.shape[2], kernel.shape[3]
    r = factor
    half = k // 2
    kq = fused_extent(k, r)
    qhalf = kq // 2

    # Static index lists (python loops over r^2 phases x k^2 taps).
    qy_i, qx_i, u_i, v_i, wy_i, wx_i = [], [], [], [], [], []
    for py in range(r):
        for px in range(r):
            for dy in range(-half, half + 1):
                for dx in range(-half, half + 1):
                    qy, ry = divmod(py + dy, r)
                    qx, rx = divmod(px + dx, r)
                    qy_i.append(qy + qhalf)
                    qx_i.append(qx + qhalf)
                    u_i.append(ry * r + rx)       # phase part of u
                    v_i.append(py * r + px)       # phase part of v
                    wy_i.append(dy + half)
                    wx_i.append(dx + half)
    qy_i = np.asarray(qy_i)
    qx_i = np.asarray(qx_i)
    u_i = np.asarray(u_i)
    v_i = np.asarray(v_i)

    # Gather the contributing taps: (P, Cin, Cout) where P = r^2 * k^2.
    taps = kernel[np.asarray(wy_i), np.asarray(wx_i)]  # (P, Cin, Cout)
    K = jnp.zeros((kq, kq, cin * r * r, cout * r * r), kernel.dtype)
    c_idx = np.arange(cin) * r * r
    o_idx = np.arange(cout) * r * r
    # Scatter every tap into its (qy, qx, c*r^2+u, o*r^2+v) slot.
    full_u = (c_idx[None, :, None] + u_i[:, None, None])          # (P, Cin, 1)
    full_v = (o_idx[None, None, :] + v_i[:, None, None])          # (P, 1, Cout)
    K = K.at[qy_i[:, None, None], qx_i[:, None, None],
             np.broadcast_to(full_u, taps.shape),
             np.broadcast_to(full_v, taps.shape)].add(taps)
    B = None
    if bias is not None:
        B = jnp.repeat(bias, r * r)  # v = o*r^2 + phase -> o-major repeat
    return K, B


def fuse_conv3d_through_shuffle2d(kernel: jnp.ndarray,
                                  bias: jnp.ndarray | None, factor: int):
    """3D variant for the volumetric tails: rearrange a (kd, kh, kw, Cin,
    Cout) SAME-conv kernel that runs AFTER ``_pixel_shuffle_2d_in_3d``
    (H/W shuffled by ``factor``, D untouched — models/vol3d.py) into a
    (kd, kq, kq, Cin*r^2, Cout*r^2) kernel that runs BEFORE it. The depth
    taps pass through unchanged; H/W taps fold exactly as in
    :func:`fuse_conv_through_shuffle` (same u/v channel packing — the 2D
    and 2D-in-3D shuffles share it). Returns (K, B); apply as
    ``_pixel_shuffle_2d_in_3d(conv3d(pre, K, SAME) + B, factor)``."""
    # The H/W fold is EXACTLY the 2D fold applied per depth tap (depth is
    # a passthrough conv dim) — reuse the 2D construction so the subtle
    # divmod/phase-packing logic has a single implementation.
    kd = kernel.shape[0]
    K = jnp.stack([fuse_conv_through_shuffle(kernel[d], None, factor)[0]
                   for d in range(kd)])
    B = None if bias is None else jnp.repeat(bias, factor * factor)
    return K, B


def conv_through_shuffle(pre: jnp.ndarray, kernel: jnp.ndarray,
                         bias: jnp.ndarray | None, factor: int) -> jnp.ndarray:
    """pixel_shuffle(pre, factor) -> SAME conv(kernel, bias), computed
    WITHOUT materializing the shuffled array."""
    from vsr_tpu.ops.pixel_shuffle import pixel_shuffle

    K, B = fuse_conv_through_shuffle(kernel, bias, factor)
    pad = K.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        pre, K.astype(pre.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if B is not None:
        y = y + B.astype(pre.dtype)
    return pixel_shuffle(y, factor)
