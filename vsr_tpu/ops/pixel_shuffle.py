"""Sub-pixel (pixel-shuffle) rearrangement, channels-last.

torch.nn.PixelShuffle semantics in NHWC: ``out[y*r+dy, x*r+dx, c] =
in[y, x, c*r*r + dy*r + dx]`` — pure reshape/transpose, which XLA fuses into
the producing convolution; there is nothing to hand-kernel here.
``space_to_depth`` is the inverse, used by FRVSR to repack an upscaled warp
(``/root/reference/src/model/nets/frvsr_net.py`` SpaceToDepth).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H, W, C*r^2) -> (..., H*r, W*r, C)."""
    *lead, h, w, c = x.shape
    r = factor
    if c % (r * r) != 0:
        raise ValueError(f"Channels {c} not divisible by factor^2={r * r}")
    c_out = c // (r * r)
    x = x.reshape(*lead, h, w, c_out, r, r)
    # (..., h, w, c, dy, dx) -> (..., h, dy, w, dx, c)
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2)
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c_out)


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(..., H*r, W*r, C) -> (..., H, W, C*r^2); exact inverse of
    :func:`pixel_shuffle`."""
    *lead, hr, wr, c = x.shape
    r = factor
    if hr % r or wr % r:
        raise ValueError(f"Spatial dims ({hr},{wr}) not divisible by {r}")
    h, w = hr // r, wr // r
    x = x.reshape(*lead, h, r, w, r, c)
    # (..., h, dy, w, dx, c) -> (..., h, w, c, dy, dx)
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 2, n + 4, n + 1, n + 3)
    x = x.transpose(perm)
    return x.reshape(*lead, h, w, c * r * r)
