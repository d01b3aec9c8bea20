"""PSNR / SSIM metrics as on-device jnp reductions, channels-last.

Parity with ``/root/reference/src/model/metrics.py``:

- PSNR: per-sample MSE over all non-batch dims, ``10*log10(max^2 /
  (mse + 1e-10))`` (``metrics.py:29-31``).
- SSIM: depthwise **valid** (unpadded) convolution with an 11-tap kernel and
  the reference's idiosyncratic Gaussian ``exp(-((x - 5) / (2*1.5))^2)`` —
  an effective sigma of 2.12, not 1.5 (``metrics.py:70-77``). Reproduced
  exactly; changing it would shift SSIM parity.
- Cardiac variants crop to a per-patient bbox loaded from the
  ``coordinates.pkl`` produced by the cropping pipeline
  (``metrics.py:116-165``).

Layout: arrays are channels-last — (N, H, W, C) for dim=2 and
(N, D, H, W, C) for dim=3 — the native TPU convolution layout (the math is
layout-invariant; only the conv dimension_numbers differ from the torch
original).
"""

from __future__ import annotations

import math
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from vsr_tpu.registry import register


class Metric:
    def __call__(self, output, target):
        raise NotImplementedError

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def __repr__(self) -> str:
        return self.__class__.__name__


@register("metric")
class PSNR(Metric):
    def __init__(self, size_average: bool = True, max_value: float = 255):
        self.size_average = size_average
        self.max_value = float(max_value)

    def __call__(self, output, target):
        reduced = tuple(range(1, output.ndim))
        mse = jnp.mean(jnp.square(output - target), axis=reduced)
        psnr = 10.0 * jnp.log10(self.max_value**2 / (mse + 1e-10))
        return jnp.mean(psnr) if self.size_average else psnr


def _reference_gaussian_kernel(dim: int, size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """The reference's separable kernel: product over axes of
    ``(1/(sigma*sqrt(2*pi))) * exp(-((x - size//2) / (2*sigma))^2)``,
    normalized to sum 1. (Note the missing square in the denominator — a
    quirk of metrics.py:74 we replicate for parity.)"""
    x = np.arange(size, dtype=np.float64)
    mean = size // 2
    g1 = (1.0 / (sigma * math.sqrt(2 * math.pi))) * np.exp(-(((x - mean) / (2 * sigma)) ** 2))
    kernel = g1
    for _ in range(dim - 1):
        kernel = np.multiply.outer(kernel, g1)
    kernel /= kernel.sum()
    return kernel.astype(np.float32)


@register("metric")
class SSIM(Metric):
    def __init__(
        self,
        dim: int = 2,
        channels: int = 1,
        size_average: bool = True,
        value_range: float = 255,
    ):
        if dim not in (2, 3):
            raise ValueError(f"Only dim=2, 3 are supported. Received dim={dim}.")
        self.dim = dim
        self.channels = channels
        self.size_average = size_average
        self.value_range = float(value_range)
        self.c1 = (0.01 * value_range) ** 2
        self.c2 = (0.03 * value_range) ** 2
        # Depthwise kernel, spatial dims + (in=1, out_multiplier=1) trailing.
        k = _reference_gaussian_kernel(dim)
        self.kernel = jnp.asarray(k.reshape(k.shape + (1, 1)))
        if dim == 2:
            self._dn = ("NHWC", "HWIO", "NHWC")
        else:
            self._dn = ("NDHWC", "DHWIO", "NDHWC")

    def _filter(self, x):
        kernel = jnp.broadcast_to(self.kernel, self.kernel.shape[:-1] + (self.channels,))
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel.astype(jnp.float32),
            window_strides=(1,) * self.dim,
            padding="VALID",
            dimension_numbers=self._dn,
            feature_group_count=self.channels,
            precision=jax.lax.Precision.HIGHEST,
        )

    def __call__(self, output, target):
        spatial = output.shape[1:-1]
        if any(s < 11 for s in spatial):
            raise ValueError(
                f"SSIM needs every spatial dim >= 11 (valid 11-tap window); "
                f"got spatial shape {spatial}. For thin volumes use dim=2 "
                f"SSIM per slice instead."
            )
        mu1 = self._filter(output)
        mu2 = self._filter(target)
        sigma1_sq = self._filter(output * output) - mu1 * mu1
        sigma2_sq = self._filter(target * target) - mu2 * mu2
        sigma12 = self._filter(output * target) - mu1 * mu2
        ssim_map = ((2 * mu1 * mu2 + self.c1) * (2.0 * sigma12 + self.c2)) / (
            (mu1 * mu1 + mu2 * mu2 + self.c1) * (sigma1_sq + sigma2_sq + self.c2)
        )
        if self.size_average:
            return jnp.mean(ssim_map)
        reduced = tuple(range(1, ssim_map.ndim))
        return jnp.mean(ssim_map, axis=reduced)


@register("metric")
class SliceSSIM(Metric):
    """2D SSIM averaged over the depth axis of (N, D, H, W, C) volumes.

    The volumetric SSIM (dim=3) needs depth >= 11 for its valid 11-tap
    window; cardiac stacks are ~10 slices, so volumetric tasks score SSIM
    in-plane per slice and average — matching how the 2D tasks score frames.
    """

    def __init__(self, channels: int = 1, size_average: bool = True,
                 value_range: float = 255):
        self.size_average = size_average
        self.ssim = SSIM(dim=2, channels=channels, size_average=size_average,
                         value_range=value_range)

    def __call__(self, output, target):
        # vmap over depth: (N, D, H, W, C) -> per-slice (N, H, W, C).
        per_slice = jax.vmap(self.ssim, in_axes=(1, 1))(output, target)
        if self.size_average:
            return jnp.mean(per_slice)
        return jnp.mean(per_slice, axis=0)  # (N,) per-sample, like PSNR


class _CardiacMixin:
    """Crop output/target to the per-patient heart bbox before scoring.

    The crop happens in numpy index space (static per patient), so each
    distinct bbox shape compiles once. ``host_only`` keeps these metrics out
    of the predictors' jitted batch-eval (per-patient crops are dynamic
    shapes); ``needs_name`` makes the call sites pass the patient name —
    mirroring the reference's name-based dispatch
    (``acdc_sisr_predictor.py:143-146``).
    """

    host_only = True
    needs_name = True

    def __init__(self, coordinates_path: str):
        # Lazy load: constructing metrics from a config must not require the
        # preprocessing artifacts to exist yet (they are read on first use).
        self.coordinates_path = coordinates_path
        self._coordinates = None

    @property
    def coordinates(self) -> dict:
        if self._coordinates is None:
            with open(self.coordinates_path, "rb") as f:
                self._coordinates = pickle.load(f)
        return self._coordinates

    def _crop(self, output, target, name: str):
        h0, hn, w0, wn = self.coordinates[name]
        # Channels-last: spatial dims are (-3, -2).
        return (
            output[..., h0:hn, w0:wn, :],
            target[..., h0:hn, w0:wn, :],
        )


@register("metric")
class CardiacPSNR(_CardiacMixin, Metric):
    def __init__(self, coordinates_path: str, **kwargs):
        _CardiacMixin.__init__(self, coordinates_path)
        self.psnr = PSNR(**kwargs)

    def __call__(self, output, target, name: str):
        output, target = self._crop(output, target, name)
        return self.psnr(output, target)


@register("metric")
class CardiacSSIM(_CardiacMixin, Metric):
    def __init__(self, coordinates_path: str, **kwargs):
        _CardiacMixin.__init__(self, coordinates_path)
        self.ssim = SSIM(**kwargs)

    def __call__(self, output, target, name: str):
        output, target = self._crop(output, target, name)
        return self.ssim(output, target)
