"""Bicubic resampling compatible with ``cv2.resize(..., INTER_CUBIC)``.

The reference's LR simulation finishes with an OpenCV bicubic downscale
(``/root/reference/src/acdc_preprocess.py:132``), so "bit-comparable
preprocessing" requires reproducing OpenCV's convention exactly:

- Keys cubic kernel with a = -0.75,
- pixel-center alignment ``src = (dst + 0.5) * scale - 0.5``,
- 4-tap neighborhood with clamped (replicated) borders,
- no antialiasing prefilter even when minifying.

This is the same convention as ``torch.nn.functional.interpolate(mode=
'bicubic', align_corners=False)``, which the test-suite uses as an
independent golden implementation.

Rather than gathering per-pixel taps, we materialize the separable resize as
two small dense matrices ``out = R_h @ img @ R_w.T``. On TPU this turns the
whole resample into two MXU matmuls — the fastest possible formulation for
the image sizes in this project — and it makes the numpy and jnp paths share
one weight construction.
"""

from __future__ import annotations

import functools

import numpy as np

_A = -0.75  # Keys kernel free parameter, OpenCV's choice.


def _cubic_coeffs(frac: np.ndarray) -> np.ndarray:
    """The 4 interpolation weights for fractional offsets ``frac`` in [0,1).

    Returns shape ``frac.shape + (4,)`` for taps at offsets [-1, 0, 1, 2].
    """
    x = frac.astype(np.float64)
    a = _A
    w0 = ((a * (x + 1) - 5 * a) * (x + 1) + 8 * a) * (x + 1) - 4 * a
    w1 = ((a + 2) * x - (a + 3)) * x * x + 1
    w2 = ((a + 2) * (1 - x) - (a + 3)) * (1 - x) * (1 - x) + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=256)
def bicubic_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) float64 matrix applying 1-D bicubic resize."""
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    weights = _cubic_coeffs(frac)  # (out, 4)

    matrix = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(base + tap - 1, 0, in_size - 1)
        np.add.at(matrix, (dst.astype(np.int64), idx), weights[:, tap])
    matrix.setflags(write=False)
    return matrix


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.INTER_CUBIC-compatible resize of a (H, W) or (H, W, C) array."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    in_h, in_w, _ = img.shape
    r_h = bicubic_resize_matrix(in_h, out_h)
    r_w = bicubic_resize_matrix(in_w, out_w)
    out = np.einsum("hi,iwc,wj->hjc", r_h, img.astype(np.float64), r_w.T)
    out = out.astype(np.result_type(img.dtype, np.float32))
    return out[..., 0] if squeeze else out


def resize_bicubic_jax(img, out_h: int, out_w: int, dtype=None):
    """JAX version: two MXU matmuls over the last-two-but-one dims.

    ``img`` is (..., H, W); the weight matrices are baked in as constants at
    trace time (shapes are static under jit).
    """
    import jax
    import jax.numpy as jnp

    in_h, in_w = img.shape[-2], img.shape[-1]
    compute_dtype = dtype or jnp.float32
    r_h = jnp.asarray(bicubic_resize_matrix(in_h, out_h), dtype=compute_dtype)
    r_w = jnp.asarray(bicubic_resize_matrix(in_w, out_w), dtype=compute_dtype)
    x = img.astype(compute_dtype)
    # (..., H, W) -> (..., out_h, W) -> (..., out_h, out_w). HIGHEST precision:
    # the default TPU matmul precision is bf16 passes, far too coarse for the
    # bit-comparable preprocessing contract.
    highest = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,...hw->...ow", r_h, x, precision=highest)
    x = jnp.einsum("...hw,ow->...ho", x, r_w, precision=highest)
    return x
