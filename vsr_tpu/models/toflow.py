"""TOFlow — Task-Oriented Flow for MISR.

Parity with ``/root/reference/src/model/nets/toflow_net.py``: all frames are
bicubic-upsampled to HR first (align_corners=False), padded to /16 with the
batch min; a 4-level SpyNet (7x7 conv + BatchNorm blocks, coarse-to-fine,
flow doubled at each upsample) estimates flow from each neighbor to the
reference frame; neighbors are backward-warped (zeros padding) and the
stacked frames go through a 9x9/1x1 fusion head with a reference-frame
residual.

BatchNorm runs in the torch convention (momentum 0.1 -> flax 0.9, eps 1e-5);
``__call__`` takes ``train`` and the running stats live in the
``batch_stats`` collection (the trainer threads them through the step).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.data.datasets import misr_target_index
from vsr_tpu.models.common import Conv
from vsr_tpu.ops.upsample import upsample_bicubic, upsample_bilinear
from vsr_tpu.ops.warp import flow_warp
from vsr_tpu.registry import register


class _SpyNetBlock(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [32, 64, 32, 16]
        for w in widths:
            x = Conv(w, 7, padding=3, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.relu(x)
        return Conv(2, 7, padding=3, dtype=self.dtype)(x)


class SpyNet(nn.Module):
    """4-level pyramid flow estimator (``toflow_net.py:70-92``). Returns a
    (N, H, W, 2) pixel-displacement flow with [..., 0]=x, [..., 1]=y."""

    dtype: Any = None

    @nn.compact
    def __call__(self, ref, nbr, train: bool = False):
        n, h, w, c = ref.shape
        refs, nbrs = [ref], [nbr]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), strides=(2, 2)))
            nbrs.insert(0, nn.avg_pool(nbrs[0], (2, 2), strides=(2, 2)))

        blocks = [_SpyNetBlock(dtype=self.dtype) for _ in range(4)]
        flow = jnp.zeros((n, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            flow_up = upsample_bilinear(flow, scale=2, align_corners=True) * 2.0
            warped = flow_warp(nbrs[i], flow_up, padding_mode="zeros")
            flow = flow_up + blocks[i](
                jnp.concatenate([refs[i], warped, flow_up], axis=-1), train=train
            )
        return flow


@register("net")
class TOFlowNet(nn.Module):
    in_channels: int
    out_channels: int
    num_frames: int
    upscale_factor: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, T, h, w, C) -> (N, H, W, C)."""
        n, t, h, w, c = x.shape
        assert t == self.num_frames
        ref_idx = misr_target_index(self.num_frames)

        # Bicubic pre-upsampling of every frame (fold T into N).
        y = upsample_bicubic(
            x.reshape(n * t, h, w, c), scale=self.upscale_factor,
            align_corners=False,
        )
        hh, ww = y.shape[1], y.shape[2]

        h_diff = (16 - hh % 16) % 16
        w_diff = (16 - ww % 16) % 16
        padded = h_diff or w_diff
        if padded:
            pad = ((0, 0), (h_diff // 2, h_diff - h_diff // 2),
                   (w_diff // 2, w_diff - w_diff // 2), (0, 0))
            y = jnp.pad(y, pad, constant_values=y.min())
            hh, ww = y.shape[1], y.shape[2]
        frames = y.reshape(n, t, hh, ww, c)

        ref = frames[:, ref_idx]
        spy = SpyNet(dtype=self.dtype)
        warped = []
        for i in range(self.num_frames):
            if i == ref_idx:
                warped.append(ref)
            else:
                nbr = frames[:, i]
                flow = spy(ref, nbr, train=train)
                warped.append(flow_warp(nbr, flow, padding_mode="zeros"))
        stacked = jnp.concatenate(warped, axis=-1)  # (N, H, W, T*C)

        z = nn.relu(Conv(64, 9, padding=4, dtype=self.dtype)(stacked))
        z = nn.relu(Conv(64, 9, padding=4, dtype=self.dtype)(z))
        z = nn.relu(Conv(64, 1, padding=0, dtype=self.dtype)(z))
        out = Conv(self.out_channels, 1, padding=0, dtype=self.dtype)(z) + ref

        if padded:
            out = out[:, h_diff // 2 : out.shape[1] - (h_diff - h_diff // 2),
                      w_diff // 2 : out.shape[2] - (w_diff - w_diff // 2)]
        return out
