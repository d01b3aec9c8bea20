"""k-space truncation LR simulation.

Reproduces the reference ``Downscale`` operator
(``/root/reference/src/acdc_preprocess.py:102-180``, duplicated in
``dsb15_preprocess.py``): orthonormal centered FFT -> zero all but the
central ``(H//f, W//f)`` rectangle -> inverse FFT -> ``round(abs(.))`` ->
bicubic downscale by ``f`` -> ``clip(round(.), 0, 255)``.

Two implementations:

- :func:`kspace_downscale` — numpy/float64, bit-comparable to the reference
  (numpy.fft is the identical backend; the bicubic matches cv2's kernel).
- :func:`kspace_downscale_jax` — a fused XLA version (batched over frames)
  used by the on-device preprocessing pipeline and benchmarks. FFT runs in
  complex64 on TPU; after the final round+clip the results agree with the
  numpy path except for values within float tolerance of an ``x.5`` rounding
  boundary.
"""

from __future__ import annotations

import numpy as np

from vsr_tpu.preprocess.resize import resize_bicubic, resize_bicubic_jax


def kspace_truncation_mask(h: int, w: int, factor: int) -> np.ndarray:
    """The central-rectangle pass mask in fftshifted coordinates."""
    mask = np.zeros((h, w), dtype=np.float64)
    kx_max, ky_max = h // 2, w // 2
    lx, ly = h // factor, w // factor
    mask[
        kx_max - lx // 2 : kx_max + (lx - lx // 2),
        ky_max - ly // 2 : ky_max + (ly - ly // 2),
    ] = 1.0
    return mask


def kspace_lowpass(img: np.ndarray, factor: int) -> np.ndarray:
    """FFT -> truncate -> iFFT -> round(abs(.)) at the original resolution."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    kspace = np.fft.fftshift(np.fft.fftn(np.fft.ifftshift(img), norm="ortho"))
    mask = kspace_truncation_mask(img.shape[0], img.shape[1], factor)[..., None]
    lowpassed = np.fft.fftshift(np.fft.ifftn(np.fft.ifftshift(kspace * mask), norm="ortho"))
    out = np.around(np.abs(lowpassed))
    return out[..., 0] if squeeze else out


def kspace_downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """Full LR simulation for one (H, W) or (H, W, 1) frame, numpy path."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    low = kspace_lowpass(img, factor)
    h, w, _ = low.shape
    lr = resize_bicubic(low[..., 0], h // factor, w // factor)
    lr = np.clip(np.round(lr), 0, 255)[..., None]
    return lr[..., 0] if squeeze else lr


def kspace_downscale_jax(imgs, factor: int):
    """Fused jnp LR simulation for a batch of frames.

    Args:
        imgs: (..., H, W) float array in [0, 255].
        factor: integer downscale factor.

    Returns:
        (..., H//factor, W//factor) float32 LR frames in [0, 255].
    """
    import jax.numpy as jnp

    h, w = imgs.shape[-2], imgs.shape[-1]
    x = imgs.astype(jnp.complex64)
    axes = (-2, -1)
    k = jnp.fft.fftshift(
        jnp.fft.fftn(jnp.fft.ifftshift(x, axes=axes), axes=axes, norm="ortho"),
        axes=axes,
    )
    mask = jnp.asarray(kspace_truncation_mask(h, w, factor), dtype=jnp.float32)
    k = k * mask
    low = jnp.fft.fftshift(
        jnp.fft.ifftn(jnp.fft.ifftshift(k, axes=axes), axes=axes, norm="ortho"),
        axes=axes,
    )
    low = jnp.round(jnp.abs(low))
    lr = resize_bicubic_jax(low, h // factor, w // factor)
    return jnp.clip(jnp.round(lr), 0.0, 255.0)
