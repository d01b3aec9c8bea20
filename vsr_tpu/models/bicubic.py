"""Bicubic upsampling baseline net.

Parity with ``/root/reference/src/model/nets/bicubic.py``:
``nn.Upsample(scale_factor, mode='bicubic', align_corners=True)`` — a
parameter-free baseline that never loads a checkpoint (``main.py:151``).
"""

from __future__ import annotations

from flax import linen as nn

from vsr_tpu.ops.upsample import upsample_bicubic
from vsr_tpu.registry import register


@register("net")
class Bicubic(nn.Module):
    upscale_factor: int

    @nn.compact
    def __call__(self, x):
        return upsample_bicubic(x, scale=self.upscale_factor, align_corners=True)
