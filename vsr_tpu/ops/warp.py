"""Backward warping (optical-flow sampling) — torch ``grid_sample``
equivalent, channels-last, XLA gather based.

Used by the FRVSR recurrent warp (``/root/reference/src/model/nets/
frvsr_net.py`` STN) and TOFlow/EDVR neighbor alignment (``toflow_net.py``
``flow_warp``; ``edvr_net/arch_util.py:flow_warp``). torch 1.1 grid_sample
semantics = bilinear, ``align_corners=True``, zeros padding — replicated
here. The bilinear gather vectorizes to 4 XLA gathers + lerp; offsets are
data-dependent so this is the irregular-memory op of the flow nets (a Pallas
fused version can replace it if it shows up in profiles, but XLA's gather on
TPU handles the (H, W)-contiguous case well).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_hw(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img: (N, H, W, C); yi/xi: (N, Ho, Wo) int32 -> (N, Ho, Wo, C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = yi * w + xi  # (N, Ho, Wo)
    return jnp.take_along_axis(
        flat, idx.reshape(n, -1, 1), axis=1
    ).reshape(idx.shape + (c,))


def grid_sample_bilinear(
    img: jnp.ndarray,
    grid_y: jnp.ndarray,
    grid_x: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``img`` (N, H, W, C) at fractional pixel coords (N, Ho, Wo).

    ``padding_mode='zeros'``: out-of-bounds contributions are zero (torch
    default); ``'border'``: coordinates clamp to the edge.
    """
    n, h, w, c = img.shape
    x0 = jnp.floor(grid_x)
    y0 = jnp.floor(grid_y)
    wx = (grid_x - x0).astype(img.dtype)[..., None]
    wy = (grid_y - y0).astype(img.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        val = _gather_hw(img, yc, xc)
        if padding_mode == "zeros":
            inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            val = val * inb[..., None].astype(img.dtype)
        return val

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flow_warp(
    img: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """Backward-warp ``img`` by pixel-displacement ``flow``.

    Args:
        img: (N, H, W, C).
        flow: (N, H, W, 2) with ``flow[..., 0]`` = displacement along W (x)
            and ``flow[..., 1]`` = displacement along H (y) — the torch
            convention of both reference nets.

    Returns:
        (N, H, W, C): ``out[y, x] = img[y + flow_y, x + flow_x]`` bilinear.
    """
    n, h, w, _ = flow.shape
    ys = jnp.arange(h, dtype=flow.dtype).reshape(1, h, 1)
    xs = jnp.arange(w, dtype=flow.dtype).reshape(1, 1, w)
    grid_y = ys + flow[..., 1]
    grid_x = xs + flow[..., 0]
    return grid_sample_bilinear(img, grid_y, grid_x, padding_mode=padding_mode)


def grid_sample_normalized(
    img: jnp.ndarray, grid: jnp.ndarray, padding_mode: str = "zeros"
) -> jnp.ndarray:
    """torch.grid_sample(align_corners=True) with a normalized grid.

    ``grid``: (N, Ho, Wo, 2) in [-1, 1]; ``grid[..., 0]`` = x, ``[..., 1]``
    = y. align_corners=True maps -1 -> 0 and 1 -> size-1.
    """
    n, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * (w - 1) / 2.0
    gy = (grid[..., 1] + 1.0) * (h - 1) / 2.0
    return grid_sample_bilinear(img, gy, gx, padding_mode=padding_mode)
