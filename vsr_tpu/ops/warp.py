"""Backward warping (optical-flow sampling) — torch ``grid_sample``
equivalent, channels-last.

Used by the FRVSR recurrent warp (``/root/reference/src/model/nets/
frvsr_net.py`` STN) and TOFlow/EDVR neighbor alignment (``toflow_net.py``
``flow_warp``; ``edvr_net/arch_util.py:flow_warp``). torch 1.1 grid_sample
semantics = bilinear, ``align_corners=True``, zeros padding — replicated
here.

Two samplers (same math, golden-tested against each other and torch):

- ``method="matmul"`` (default): the bilinear row weight is the hat
  function ``relu(1 - |gy - i|)``, so sampling = one MXU contraction over
  H then a small one over W, scanned over output-row chunks to bound the
  intermediate. Chip profiling of the gather path showed TPU gathers of
  narrow rows (C=1 image warps!) run at <1% of HBM bandwidth — the same
  pathology as the deformable conv (ops/deform_conv.py), fixed the same
  way.
- ``method="gather"``: 4 fused corner gathers + lerp (the torch-shaped
  path), kept for A/B.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.custom_jvp
def hat(d: jnp.ndarray) -> jnp.ndarray:
    """Bilinear hat weight ``relu(1 - |d|)`` with the CUDA subgradient.

    At integer sample coordinates (d exactly 0 or +-1 — e.g. the zero-
    initialized DCN offsets on their first step) ``|d|``'s JAX subgradient
    is 0, which would zero the coordinate gradient; the reference CUDA
    ``col2im_coord`` (and the 4-corner gather path, via ``floor``) instead
    uses the one-sided forward difference. The custom JVP reproduces it:
    ``hat'(d) = +1 on [-1, 0), -1 on [0, 1), 0 elsewhere`` — making the
    matmul and gather samplers agree in gradient EVERYWHERE.
    """
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


@hat.defjvp
def _hat_jvp(primals, tangents):
    (d,), (td,) = primals, tangents
    slope = jnp.where((d >= -1.0) & (d < 0.0), 1.0,
                      jnp.where((d >= 0.0) & (d < 1.0), -1.0, 0.0))
    return hat(d), slope * td


@partial(jax.custom_jvp, nondiff_argnums=(1,))
def clip_coord(g: jnp.ndarray, hi: float) -> jnp.ndarray:
    """``clip(g, 0, hi)`` with torch's ``clip_coordinates`` subgradient:
    1 everywhere inside INCLUDING the exact boundaries, 0 outside.
    ``jnp.clip`` would split the tie gradient 0.5/0.5 at g == 0 or g == hi,
    halving the border-mode warp gradient of exactly-boundary coordinates.
    """
    return jnp.clip(g, 0.0, hi)


@clip_coord.defjvp
def _clip_coord_jvp(hi, primals, tangents):
    (g,), (tg,) = primals, tangents
    inside = (g >= 0.0) & (g <= hi)
    return clip_coord(g, hi), jnp.where(inside, tg, jnp.zeros_like(tg))


def _gather_hw(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """img: (N, H, W, C); yi/xi: (N, Ho, Wo) int32 -> (N, Ho, Wo, C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = yi * w + xi  # (N, Ho, Wo)
    return jnp.take_along_axis(
        flat, idx.reshape(n, -1, 1), axis=1
    ).reshape(idx.shape + (c,))


def matmul_precision(dtype) -> jax.lax.Precision:
    """f32 sampling is parity-critical (HIGHEST); bf16 rides the MXU."""
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def hat_sample_chunk(img, gy, gx, border: bool = False):
    """Hat-weighted bilinear sampling of one coordinate chunk — the shared
    MXU core of the warp and deformable-conv samplers.

    img: (B, H, W, C); gy/gx: (B, P) f32 pixel coordinates -> (B, P, C).
    Zero padding outside the image unless ``border`` (coords then must
    already be clipped to the valid range; the virtual edge rows fold into
    the boundary rows so exactly-boundary gradients match the gather/torch
    semantics: both corners equal -> forward difference 0).
    """
    b, h, w, c = img.shape
    prec = matmul_precision(img.dtype)
    iota_h = jnp.arange(h, dtype=jnp.float32)
    iota_w = jnp.arange(w, dtype=jnp.float32)
    ry = hat(gy[..., None] - iota_h)
    rx = hat(gx[..., None] - iota_w)
    if border:
        # Fold the virtual edge row's hat mass into the boundary row with a
        # broadcast multiply-add (NOT .at[].add — a scatter materializes the
        # hat matrix and blocks its fusion into the einsum operand read,
        # measured -24% on FRVSR serving).
        ry = ry + hat(gy - h)[..., None] * (iota_h == h - 1)
        rx = rx + hat(gx - w)[..., None] * (iota_w == w - 1)
    ry = ry.astype(img.dtype)
    rx = rx.astype(img.dtype)
    p = gy.shape[1]
    if w * c <= 256 and p >= 4 * w * c:
        # Narrow-lane shapes (the C=1 image warps: FRVSR HR/LR, TOFlow):
        # with W*C on the MXU lanes the row contraction packs only ~1.5 of
        # the 128-wide lane tiles, measured 51 TF/s on the FRVSR HR warp.
        # Transposing the contraction so the LARGE P dim rides the lanes
        # (img^T @ ry^T) measured 68.8 TF/s = 1.35x
        # (scripts/probe_warp_formulations.py; materializing ry/rx via
        # optimization_barrier instead was 0.61x — negative result).
        imt = jnp.swapaxes(img.reshape(b, h, w * c), 1, 2)  # (B, WC, H)
        rows_t = jnp.einsum("nkh,nph->nkp", imt, ry, precision=prec)
        rows_t = rows_t.reshape(b, w, c, p)
        return jnp.einsum("npw,nwcp->npc", rx, rows_t, precision=prec)
    rows = jnp.einsum("nph,nhwc->npwc", ry, img, precision=prec)
    return jnp.einsum("npw,npwc->npc", rx, rows, precision=prec)


def _sample_matmul(img, grid_y, grid_x, padding_mode):
    """Hat-weighted MXU sampling: (N, Ho, Wo) coords over (N, H, W, C).

    Scans over chunks of output rows so the (N, chunk*Wo, W, C)
    intermediate stays bounded (~<=256 MB at serving shapes).
    """
    n, h, w, c = img.shape
    n_, ho, wo = grid_y.shape
    gy = grid_y.astype(jnp.float32)
    gx = grid_x.astype(jnp.float32)
    border = padding_mode == "border"
    if border:
        gy = clip_coord(gy, float(h - 1))
        gx = clip_coord(gx, float(w - 1))

    # Largest divisor of Ho with chunk*Wo*W*C*N under ~64M elements.
    budget = max(1, (64 << 20) // max(1, n * wo * w * c))
    rc = 1
    for d in range(1, ho + 1):
        if ho % d == 0 and d <= budget:
            rc = d
    nchunks = ho // rc

    gy = gy.reshape(n, nchunks, rc * wo)
    gx = gx.reshape(n, nchunks, rc * wo)
    gy = jnp.moveaxis(gy, 1, 0)  # (nchunks, N, P)
    gx = jnp.moveaxis(gx, 1, 0)

    def one(_, g):
        gy_c, gx_c = g  # (N, P)
        return None, hat_sample_chunk(img, gy_c, gx_c, border=border)

    _, out = jax.lax.scan(one, None, (gy, gx))  # (nchunks, N, P, C)
    out = jnp.moveaxis(out, 0, 1).reshape(n, ho, wo, c)
    return out


def grid_sample_bilinear(
    img: jnp.ndarray,
    grid_y: jnp.ndarray,
    grid_x: jnp.ndarray,
    padding_mode: str = "zeros",
    method: str = "matmul",
) -> jnp.ndarray:
    """Sample ``img`` (N, H, W, C) at fractional pixel coords (N, Ho, Wo).

    ``padding_mode='zeros'``: out-of-bounds contributions are zero (torch
    default); ``'border'``: coordinates clamp to the edge. ``method``:
    ``"matmul"`` (hat-weighted MXU contractions, default) or ``"gather"``.
    """
    if method == "matmul":
        return _sample_matmul(img, grid_y, grid_x, padding_mode)
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
