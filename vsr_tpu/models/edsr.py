"""EDSR — Enhanced Deep Residual Networks for SISR.

Same architecture/hyperparameters as ``/root/reference/src/model/nets/
edsr_net.py`` (head conv -> num_resblocks residual blocks with res_scale +
global skip -> sub-pixel upsampling tail), built channels-last for the TPU:
3x3 convs lower to MXU-tiled ``conv_general_dilated`` and the pixel-shuffle
is a free reshape fused into the tail convolution.
"""

from __future__ import annotations

import math
from typing import Any

from flax import linen as nn

from vsr_tpu.models.common import Conv, ShuffleConv
from vsr_tpu.ops.pixel_shuffle import pixel_shuffle
from vsr_tpu.registry import register


class _ResBlock(nn.Module):
    num_features: int
    res_scale: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        res = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(x)
        res = nn.relu(res)
        res = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(res)
        return x + res * self.res_scale


class _UpBlock(nn.Module):
    """Sub-pixel upsampling ladder. Returns the PRE-shuffle array of the
    last stage (factor ``last_factor``); the caller's ShuffleConv tail
    performs that final shuffle (optionally folded into its conv)."""

    num_features: int
    upscale_factor: int
    dtype: Any = None

    @staticmethod
    def split(upscale_factor: int) -> int:
        """Factor of the LAST shuffle stage."""
        return 3 if upscale_factor == 3 else 2

    @nn.compact
    def __call__(self, x):
        f = self.upscale_factor
        if f not in (2, 3, 4, 8):
            # The reference _UpBlock supports 2^k and 3 and crashes for
            # f == 1 (edsr_net.py:64 references an undefined loop var);
            # reject explicitly instead of silently upscaling.
            raise NotImplementedError(f"upscale_factor={f}")
        if math.log2(f).is_integer():
            stages = int(math.log2(f))
            for _ in range(stages - 1):
                x = Conv(4 * self.num_features, 3, padding=1, dtype=self.dtype)(x)
                x = pixel_shuffle(x, 2)
            x = Conv(4 * self.num_features, 3, padding=1, dtype=self.dtype)(x)
        elif f == 3:
            x = Conv(9 * self.num_features, 3, padding=1, dtype=self.dtype)(x)
        else:
            raise NotImplementedError(f"upscale_factor={f}")
        return x  # pre-shuffle of the last stage


@register("net")
class EDSRNet(nn.Module):
    """Args mirror the reference (edsr_net.py:19). ``fused_tail=True`` folds
    the final conv through the last pixel-shuffle for serving (identical
    parameters/math; see ops/fused_tail.py)."""

    in_channels: int
    out_channels: int
    num_resblocks: int
    num_features: int
    upscale_factor: int
    res_scale: float = 0.1
    fused_tail: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        head = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(x)
        body = head
        for _ in range(self.num_resblocks):
            body = _ResBlock(self.num_features, self.res_scale, dtype=self.dtype)(body)
        body = Conv(self.num_features, 3, padding=1, dtype=self.dtype)(body)
        body = body + head
        pre = _UpBlock(self.num_features, self.upscale_factor, dtype=self.dtype)(body)
        return ShuffleConv(self.out_channels, 3,
                           factor=_UpBlock.split(self.upscale_factor),
                           fused=self.fused_tail, dtype=self.dtype)(pre)
