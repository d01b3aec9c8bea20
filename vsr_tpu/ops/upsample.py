"""Deterministic up/down-sampling as MXU matmuls (bicubic & bilinear).

Both align-corner conventions are supported:

- ``align_corners=False``: pixel-center mapping, cv2/torch-interpolate
  compatible (shares the kernel construction with the preprocessing resize).
- ``align_corners=True``: endpoint mapping ``src = dst*(in-1)/(out-1)`` —
  what ``nn.Upsample(align_corners=True)`` uses, needed by the reference's
  ``Bicubic`` baseline net (``/root/reference/src/model/nets/bicubic.py``)
  and TOFlow's bicubic pre-upsampling.
"""

from __future__ import annotations

import functools

import numpy as np

from vsr_tpu.preprocess.resize import _cubic_coeffs


@functools.lru_cache(maxsize=256)
def _resize_matrix_1d(
    in_size: int, out_size: int, mode: str, align_corners: bool
) -> np.ndarray:
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base

    matrix = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    if mode == "bicubic":
        weights = _cubic_coeffs(frac)  # taps at -1..2
        for tap in range(4):
            idx = np.clip(base + tap - 1, 0, in_size - 1)
            np.add.at(matrix, (rows, idx), weights[:, tap])
    elif mode == "bilinear":
        for tap, wgt in ((0, 1.0 - frac), (1, frac)):
            idx = np.clip(base + tap, 0, in_size - 1)
            np.add.at(matrix, (rows, idx), wgt)
    else:
        raise ValueError(f"Unknown mode {mode!r}")
    matrix.setflags(write=False)
    return matrix


def _resize(x, mode: str, scale, size, align_corners: bool):
    import jax
    import jax.numpy as jnp

    in_h, in_w = x.shape[-3], x.shape[-2]
    if size is not None:
        out_h, out_w = size
    elif scale is not None:
        out_h, out_w = in_h * scale, in_w * scale
    else:
        raise ValueError("Provide scale or size")
    r_h = jnp.asarray(_resize_matrix_1d(in_h, out_h, mode, align_corners), jnp.float32)
    r_w = jnp.asarray(_resize_matrix_1d(in_w, out_w, mode, align_corners), jnp.float32)
    highest = jax.lax.Precision.HIGHEST
    orig_dtype = x.dtype
    # (..., H, W, C): rows first (h -> o), then columns (w -> p).
    y = jnp.einsum("oh,...hwc->...owc", r_h, x.astype(jnp.float32), precision=highest)
    y = jnp.einsum("...hwc,pw->...hpc", y, r_w, precision=highest)
    return y.astype(orig_dtype)


def upsample_bicubic(x, scale: int | None = None, size: tuple[int, int] | None = None,
                     align_corners: bool = False):
    """Bicubic resize of (..., H, W, C) to scale or explicit (H, W) size."""
    return _resize(x, "bicubic", scale, size, align_corners)


def upsample_bilinear(x, scale: int | None = None, size: tuple[int, int] | None = None,
                      align_corners: bool = False):
    return _resize(x, "bilinear", scale, size, align_corners)
