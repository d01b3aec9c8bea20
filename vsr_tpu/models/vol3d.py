"""Volumetric (3D) super-resolution net — conv3d + in-plane sub-pixel.

BASELINE.json config #2: "3D volume x2 SR on cropped cardiac ACDC volumes
(conv3d + sub-pixel upsample)". The reference has no volumetric net (its
zoo is 2D/2D+t); this is the framework's native 3D member: an EDSR-style
residual trunk of 3x3x3 convs over (N, D, H, W, C) volumes with an
in-plane-only pixel shuffle tail (cardiac stacks are anisotropic — slice
spacing is ~10x in-plane spacing, so only H/W are upscaled, matching the
k-space degradation which is in-plane too).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.models.common import Conv3D
from vsr_tpu.registry import register


def _pixel_shuffle_2d_in_3d(x, r: int):
    """(N, D, H, W, C*r^2) -> (N, D, H*r, W*r, C)."""
    n, d, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, d, h, w, c_out, r, r)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)  # (n, d, h, r, w, r, c)
    return x.reshape(n, d, h * r, w * r, c_out)


class _ResBlock3D(nn.Module):
    features: int
    res_scale: float
    dtype: Any = None
    #: f32 residual accumulator under bf16 compute: the body's second conv
    #: keeps its MXU f32 accumulation and the ``x + 0.1*y`` add runs f32 —
    #: the res_scale-shrunk increments are exactly the magnitudes bf16
    #: accumulation loses (hybrid-precision carry path, vol4d carry_f32).
    acc_f32: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv3D(self.features, (3, 3, 3), padding=(1, 1, 1), dtype=self.dtype)(x)
        y = nn.relu(y)
        y = Conv3D(self.features, (3, 3, 3), padding=(1, 1, 1), dtype=self.dtype,
                   out_dtype=jnp.float32 if self.acc_f32 else None)(y)
        return x + y * self.res_scale


@register("net")
class Volume3DSRNet(nn.Module):
    in_channels: int
    out_channels: int
    num_resblocks: int = 8
    num_features: int = 32
    upscale_factor: int = 2
    res_scale: float = 0.1
    dtype: Any = None
    #: Serving: compute the final (thin, C_out-channel at HR) conv FOLDED
    #: through the last 2D-in-3D pixel shuffle (Conv3D.fold_shuffle2d) —
    #: the HR intermediate never materializes. Same param tree;
    #: checkpoints interchange. See scripts/profile_vol4d_serving.py.
    fused_tail: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, D, h, w, C) -> (N, D, h*r, w*r, C)."""
        f = self.upscale_factor
        head = Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                      dtype=self.dtype)(x)
        body = head
        for _ in range(self.num_resblocks):
            body = _ResBlock3D(self.num_features, self.res_scale, dtype=self.dtype)(body)
        body = Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                      dtype=self.dtype)(body) + head
        if math.log2(f).is_integer():
            stages, r_last = int(math.log2(f)), 2
        elif f == 3:
            stages, r_last = 1, 3
        else:
            raise NotImplementedError(f"upscale_factor={f}")
        if self.fused_tail and stages == 0:
            # f=1: there is no shuffle to fold through — the folded conv
            # would silently reinterpret the feature channels as phase
            # packs and EXPAND the output x2.
            raise NotImplementedError(
                "fused_tail needs an upsampling tail (upscale_factor>=2)")
        for i in range(stages):
            body = Conv3D(r_last * r_last * self.num_features, (3, 3, 3),
                          padding=(1, 1, 1), dtype=self.dtype)(body)
            if i < stages - 1 or not self.fused_tail:
                body = _pixel_shuffle_2d_in_3d(body, r_last)
        if not self.fused_tail:
            return Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                          dtype=self.dtype)(body)
        out = Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                     dtype=self.dtype, fold_shuffle2d=r_last)(body)
        return _pixel_shuffle_2d_in_3d(out, r_last)
