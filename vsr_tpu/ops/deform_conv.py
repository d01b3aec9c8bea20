"""Deformable convolution v1/v2 — TPU-native replacement for the reference
CUDA extension.

The reference implements DCN as ~1.6k lines of C++/CUDA
(``/root/reference/src/model/nets/edvr_net/dcn/``): an offset-driven
bilinear-gather im2col kernel, a grouped GEMM, and three hand-written
backward kernels (col2im, col2im_coord, weight grad). On TPU the same
computation decomposes into:

- offset-driven bilinear sampling — TWO formulations, selectable per call:

  * ``method="matmul"`` (default): the bilinear weight of image row ``i``
    for a sample at ``gy`` is exactly the hat function
    ``relu(1 - |gy - i|)`` (including the zero-padding boundary), so
    sampling becomes two dense contractions per kernel tap —
    ``Ry @ x`` over H then a small ``Rx`` contraction over W — which lower
    onto the MXU. Profiling on the chip showed each fused XLA gather of
    8-channel group rows runs at ~3 GB/s (<1% HBM: 8 lanes of 128 used);
    the hat-matmul replaces 4x65 ms of gathers per 48² DCN with ~183
    GFLOP of einsums (a few ms at MXU rates) — a ~15-40x end-to-end win
    for EDVR serving. Sample coordinates are computed in f32 regardless of
    the compute dtype (bf16 coordinates quantize to 0.25 px at x>=32).
  * ``method="gather"``: 4 fused corner gathers + lerp — the literal
    translation of the CUDA kernels; kept for A/B and as the
    reference-shaped path.

- one ``einsum`` contraction over (taps x channels) that lowers to a single
  MXU GEMM,
- and **autodiff through either sampler**: the gather path differentiates
  to the scatter-add col2im / col2im_coord backward passes the CUDA kernels
  hand-code; the matmul path differentiates to more matmuls (MXU in the
  backward too) — no custom_vjp needed for correctness.

Both variants are provided: v1 (offset only, ``deform_conv_cuda.cpp:151``)
and v2 (modulated: offset + mask, ``:486``). A hand-written Pallas kernel was
evaluated and rejected: Mosaic's dynamic-gather primitive requires matching
extents along the gather axis (verified on hardware), so the arbitrary 2D
bilinear gather cannot be expressed in-kernel without per-element loops —
the hat-matmul above is the efficient TPU formulation.

Layout is channels-last;
offsets are ``(N, Ho, Wo, dg, k*k, 2)`` with ``[..., 0]=dy, [..., 1]=dx``
(the reference's channel-packed layout unpacked into named axes), and
channels within a deformable group share offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsr_tpu.ops.warp import hat_sample_chunk


def _offset_coords(offsets, kernel, stride, padding, dilation):
    """Absolute f32 sample coordinates for every output position and tap.

    offsets: (N, Ho, Wo, dg, k2, 2) -> gy, gx each (N, Ho, Wo, dg, k2).
    f32 regardless of compute dtype: bf16 cannot resolve sub-pixel
    positions at coordinates >= 32.
    """
    kh, kw = kernel
    n, ho, wo, dg, k2, _ = offsets.shape
    assert k2 == kh * kw
    off = offsets.astype(jnp.float32)
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding
              ).reshape(1, ho, 1, 1, 1)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding
              ).reshape(1, 1, wo, 1, 1)
    # Kernel tap offsets laid out as (k2,) in (ky, kx) row-major order.
    tap_y = jnp.repeat(jnp.arange(kh, dtype=jnp.float32) * dilation, kw
                       ).reshape(1, 1, 1, 1, k2)
    tap_x = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh
                     ).reshape(1, 1, 1, 1, k2)
    return base_y + tap_y + off[..., 0], base_x + tap_x + off[..., 1]


def _sample_taps(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    kernel: tuple[int, int],
    stride: int,
    padding: int,
    dilation: int,
) -> jnp.ndarray:
    """Offset-driven bilinear im2col, vectorized over all kernel taps.

    x: (N, H, W, C); offsets: (N, Ho, Wo, dg, k2, 2).
    Returns (N, Ho, Wo, k2, C) sampled taps (zero outside).

    All k2 taps and all 4 bilinear corners share one fused gather each
    (4 gathers total) — both faster and a far smaller HLO than per-tap
    gathers (15 DCNs x 9 taps x 4 corners of scalar gathers blow up the
    compile).
    """
    n, h, w, c = x.shape
    kh, kw = kernel
    n_, ho, wo, dg, k2, _ = offsets.shape
    assert n_ == n
    cg = c // dg

    # Per-group images flattened into the batch dim: (dg*N, H*W, cg).
    xg = x.reshape(n, h, w, dg, cg)
    xg = jnp.moveaxis(xg, 3, 0).reshape(dg * n, h * w, cg)

    gy, gx = _offset_coords(offsets, kernel, stride, padding, dilation)
    gy = jnp.moveaxis(gy, 3, 0).reshape(dg * n, ho * wo * k2)
    gx = jnp.moveaxis(gx, 3, 0).reshape(dg * n, ho * wo * k2)

    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    # Corner positions/weights in f32, lerp in the compute dtype.
    wy = (gy - y0)[..., None].astype(x.dtype)
    wx = (gx - x0)[..., None].astype(x.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = (yc * w + xc)[..., None]  # (dg*N, Ho*Wo*k2, 1)
        val = jnp.take_along_axis(xg, idx, axis=1)  # (dg*N, Ho*Wo*k2, cg)
        inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        return val * inb[..., None].astype(x.dtype)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy  # (dg*N, Ho*Wo*k2, cg)

    out = out.reshape(dg, n, ho, wo, k2, cg)
    out = jnp.moveaxis(out, 0, 4)  # (N, Ho, Wo, k2, dg, cg)
    return out.reshape(n, ho, wo, k2, c)


def _sample_taps_matmul(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    kernel: tuple[int, int],
    stride: int,
    padding: int,
    dilation: int,
    scan_major: bool = False,
) -> jnp.ndarray:
    """Offset-driven bilinear im2col as hat-weighted MXU contractions.

    Same contract as :func:`_sample_taps`. For each kernel tap the sample
    at ``(gy, gx)`` is ``sum_{i,j} relu(1-|gy-i|) relu(1-|gx-j|) x[i,j]``
    — the hat products are exactly the 4-corner bilinear weights and vanish
    outside the image (zero padding). A ``lax.scan`` over the k2 taps
    bounds the live ``(dg*N, Ho*Wo, W, cg)`` intermediate to one tap.
    """
    n, h, w, c = x.shape
    kh, kw = kernel
    n_, ho, wo, dg, k2, _ = offsets.shape
    assert k2 == kh * kw and n_ == n
    cg = c // dg

    xg = x.reshape(n, h, w, dg, cg)
    xg = jnp.moveaxis(xg, 3, 0).reshape(dg * n, h, w, cg)

    gy, gx = _offset_coords(offsets, kernel, stride, padding, dilation)
    # -> (k2, dg*N, Ho*Wo), taps in the scan axis.
    gy = jnp.moveaxis(gy, 3, 0).reshape(dg * n, ho * wo, k2)
    gx = jnp.moveaxis(gx, 3, 0).reshape(dg * n, ho * wo, k2)
    gy = jnp.moveaxis(gy, 2, 0)
    gx = jnp.moveaxis(gx, 2, 0)

    def one_tap(_, g):
        gy_t, gx_t = g  # (dg*N, Ho*Wo)
        return None, hat_sample_chunk(xg, gy_t, gx_t)

    _, taps = jax.lax.scan(one_tap, None, (gy, gx))  # (k2, dg*N, Ho*Wo, cg)
    if scan_major:
        # (k2, dg, N, P, cg) — the DCN contraction can consume this
        # directly; measured SLOWER end to end on EDVR (see deform_conv2d).
        return taps.reshape(k2, dg, n, ho * wo, cg)
    taps = jnp.moveaxis(taps, 0, 2)  # (dg*N, Ho*Wo, k2, cg)
    taps = taps.reshape(dg, n, ho, wo, k2, cg)
    taps = jnp.moveaxis(taps, 0, 4)  # (N, Ho, Wo, k2, dg, cg)
    return taps.reshape(n, ho, wo, k2, c)


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    method: str = "matmul",
    scan_major: bool = False,
) -> jnp.ndarray:
    """Deformable conv: v1 when ``mask is None``, modulated v2 otherwise.

    weight: (kh, kw, Cin, Cout) (flax layout); mask: (N, Ho, Wo, dg, k2).
    ``method``: ``"matmul"`` (hat-weighted MXU contractions, default) or
    ``"gather"`` (4 fused corner gathers — the CUDA-shaped path).
    """
    from vsr_tpu.ops.warp import matmul_precision

    kh, kw, cin, cout = weight.shape
    n, ho, wo, dg, k2 = offsets.shape[:5]
    cg = cin // dg
    # The main GEMM follows the compute dtype like every other conv
    # (HIGHEST on f32 for parity; bf16 rides the MXU single-pass).
    prec = matmul_precision(x.dtype)
    if method == "matmul" and scan_major:
        # Contract the scan-major taps (k2, dg, N, P, cg) in place. A/B on
        # the chip: 0.88x end to end on EDVR — XLA folds the post-scan
        # moveaxis chain into the GEMM operand read anyway, and the
        # k-major reduction layout tiles worse. Kept as an opt-in A/B path.
        col = _sample_taps_matmul(x, offsets, (kh, kw), stride, padding,
                                  dilation, scan_major=True)
        if mask is not None:
            m = mask.reshape(n, ho * wo, dg, k2)
            m = jnp.transpose(m, (3, 2, 0, 1))[..., None]  # (k2,dg,n,P,1)
            col = col * m.astype(col.dtype)
        w = weight.reshape(kh * kw, dg, cg, cout)
        out = jnp.einsum("kdnpc,kdco->npo", col, w, precision=prec)
        out = out.reshape(n, ho, wo, cout)
    else:
        sampler = (_sample_taps_matmul if method == "matmul"
                   else _sample_taps)
        col = sampler(x, offsets, (kh, kw), stride, padding, dilation)
        if mask is not None:
            mm = jnp.repeat(mask, cg, axis=3)  # (N,Ho,Wo,C,k2) dg-major
            # mask layout must match col channel order (dg, cg): repeat on
            # dg axis after moving k2 forward.
            mm = jnp.moveaxis(mm, 4, 3)  # (N, Ho, Wo, k2, C)
            col = col * mm
        out = jnp.einsum(
            "nhwkc,kco->nhwo",
            col,
            weight.reshape(kh * kw, cin, cout),
            precision=prec,
        )
    if bias is not None:
        out = out + bias
    return out
