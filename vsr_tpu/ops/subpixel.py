"""Sub-pixel (phase-decomposed) transposed convolution.

A strided ConvTranspose lowers on XLA to an input-dilated convolution: the
MXU convolves an input where ``stride-1`` zeros pad every pixel, wasting
most of the sampled window on known zeros. This op computes the EXACT same
linear map as ``models.common.ConvTranspose`` (torch ConvTranspose2d
geometry: out = in*s, padding p) as ONE dense stride-1 convolution at LR
with ``s^2 * features`` output channels followed by a depth-to-space
interleave (a reshape/transpose). Measured on the chip
(scripts/probe_deconv_subpixel.py): ~1.15x on DBPN up/down ladder pairs.

Derivation. ``lax.conv_transpose(x, W, s, padding=(k-1-p))`` measures as

    out[y] = sum_i x[i] * W[(k-1) - y + s*i - p]

(impulse response; the kernel spreads reversed from output ``s*i -
(k-1-p) + (k-1)``). Output phase ``r = y mod s`` therefore reads only taps
``a ≡ (k-1-p - r) (mod s)``; tap ``a0_r + s*m`` reads input pixel ``j +
c_r + m`` with ``c_r = (r + a0_r - (k-1-p)) / s``. Collecting each
phase's taps into a dense
kernel row (aligned across phases to a common window so one conv serves
all s^2 phases) gives a plain conv whose outputs interleave back by
depth-to-space. Weights stay in the ConvTranspose layout ``(k, k, In,
Out)`` — checkpoints, transplants, and reference parity are untouched; the
regrouping is a gather the compiler folds.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def _phase_geometry(k: int, s: int, p: int):
    """Per-phase taps and offsets; returns (taps[r], c[r], window, pad_lo).

    From the measured impulse response of ``lax.conv_transpose``:
    ``out[y] = sum_i x[i] * W[(k-1) - y + s*i - p]``, so phase ``r = y mod
    s`` reads taps ``a ≡ (k-1-p - r) (mod s)``, and tap ``a0+s*m`` reads
    input ``j + c_r + m`` with ``c_r = (r + a0 - (k-1-p)) / s``.
    """
    d = k - 1 - p
    taps, offs = [], []
    for r in range(s):
        a0 = (d - r) % s
        t = list(range(a0, k, s))
        taps.append(t)
        offs.append((r + a0 - d) // s)
    starts = offs
    ends = [c + len(t) - 1 for c, t in zip(offs, taps)]
    cmin, cmax = min(starts), max(ends)
    window = cmax - cmin + 1
    return taps, offs, window, -cmin


def subpixel_kernel(kernel: jnp.ndarray, s: int, p: int):
    """(k, k, In, Out) ConvTranspose kernel -> ((w, w, In, s*s*Out), pad_lo).

    Output channel block ``(ry*s + rx)*Out + o`` holds phase (ry, rx).
    """
    k = kernel.shape[0]
    taps, offs, w, pad_lo = _phase_geometry(k, s, p)
    cin, cout = kernel.shape[2], kernel.shape[3]
    bank = jnp.zeros((w, w, cin, s * s * cout), kernel.dtype)
    for ry in range(s):
        for rx in range(s):
            block = ry * s + rx
            sel = kernel[np.ix_(taps[ry], taps[rx])]  # (ty, tx, In, Out)
            y0 = offs[ry] + pad_lo
            x0 = offs[rx] + pad_lo
            bank = bank.at[y0:y0 + len(taps[ry]), x0:x0 + len(taps[rx]), :,
                           block * cout:(block + 1) * cout].set(sel)
    return bank, pad_lo


def conv_transpose_subpixel(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray | None, s: int, p: int):
    """Exact ConvTranspose2d(k, s, p) via one stride-1 conv + interleave.

    x: (N, H, W, Cin); kernel: (k, k, Cin, Cout). Returns (N, sH, sW, Cout).
    """
    cout = kernel.shape[3]
    bank, pad_lo = subpixel_kernel(kernel, s, p)
    w = bank.shape[0]
    pad = [(pad_lo, w - 1 - pad_lo)] * 2
    y = lax.conv_general_dilated(
        x, bank.astype(x.dtype), window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, hh, ww, _ = y.shape
    y = y.reshape(n, hh, ww, s, s, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * s, ww * s, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
