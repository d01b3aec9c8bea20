"""4D (3D+time) spatio-temporal super-resolution.

BASELINE.json config #3: "4D (3D+time) spatio-temporal SR over full cardiac
cine sequences with temporal patch sampling". No reference counterpart (its
temporal nets are 2D+t); this is the framework's native 4D member: the DRF
recurrence pattern (hidden state reset at frame 0, carried across frames,
``lax.scan`` over T) applied to volumetric features — each step runs 3D
convs over the (D, H, W) volume of that frame and emits an in-plane
sub-pixel upscaled volume.

Input (N, T, D, h, w, C) -> output (N, T, D, h*r, w*r, C).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.models.common import Conv3D
from vsr_tpu.models.vol3d import _pixel_shuffle_2d_in_3d, _ResBlock3D
from vsr_tpu.registry import register


class _Vol4DStep(nn.Module):
    num_features: int
    num_resblocks: int
    out_channels: int
    upscale_factor: int
    res_scale: float
    dtype: Any = None

    @nn.compact
    def __call__(self, hidden, in_feat):
        f = self.num_features
        x = Conv3D(f, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype)(
            jnp.concatenate([in_feat, hidden], axis=-1)
        )
        for _ in range(self.num_resblocks):
            x = _ResBlock3D(f, self.res_scale, dtype=self.dtype)(x)
        new_hidden = x
        y = in_feat + x  # global feature skip (DRF pattern)
        r = self.upscale_factor
        if math.log2(r).is_integer():
            for _ in range(int(math.log2(r))):
                y = Conv3D(4 * f, (3, 3, 3), padding=(1, 1, 1), dtype=self.dtype)(y)
                y = _pixel_shuffle_2d_in_3d(y, 2)
        elif r == 3:
            y = Conv3D(9 * f, (3, 3, 3), padding=(1, 1, 1), dtype=self.dtype)(y)
            y = _pixel_shuffle_2d_in_3d(y, 3)
        else:
            raise NotImplementedError(f"upscale_factor={r}")
        out = Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                     dtype=self.dtype)(y)
        return new_hidden, out


@register("net")
class Volume4DSRNet(nn.Module):
    in_channels: int
    out_channels: int
    num_features: int = 32
    num_resblocks: int = 4
    upscale_factor: int = 2
    res_scale: float = 0.1
    remat: bool = False
    dtype: Any = None
    #: lax.scan ``unroll`` for the time loop (exact; see DRFNet.unroll —
    #: the device trainer sets it to the training window T automatically).
    unroll: int = 1

    @nn.compact
    def __call__(self, x):
        """x: (N, T, D, h, w, C) -> (N, T, D, h*r, w*r, C)."""
        n, t, d, h, w, c = x.shape
        in_feats = Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                          dtype=self.dtype)(x.reshape(n * t, d, h, w, c))
        in_feats = in_feats.reshape(n, t, d, h, w, self.num_features)
        feats_t = jnp.moveaxis(in_feats, 1, 0)  # (T, N, D, h, w, F)

        step_cls = nn.remat(_Vol4DStep) if self.remat else _Vol4DStep
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=min(self.unroll, t),
        )
        _, outputs = scan(
            self.num_features, self.num_resblocks, self.out_channels,
            self.upscale_factor, self.res_scale, dtype=self.dtype, name="step",
        )(feats_t[0], feats_t)
        return jnp.moveaxis(outputs, 0, 1)
