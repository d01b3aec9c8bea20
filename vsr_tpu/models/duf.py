"""DUF — Video SR with Dynamic Upsampling Filters (MISR).

Parity with ``/root/reference/src/model/nets/duf_net.py``: shared 2D head
per frame -> dense 3D backbone (16/28/52-layer variants; the temporal extent
shrinks by 2 in each of the last three dense blocks via unpadded t-convs,
with the running concat trimmed to match) -> two 1x1x1 Conv3D branches:
per-pixel upsampling filters (softmax over k^2) applied to the raw center
frame, plus a pixel-shuffled residual.

Layout is NDHWC (T as depth); BatchNorm uses the torch convention and lives
in ``batch_stats`` (net takes ``train``). The dynamic-filter application is
the fused patches+einsum op in ``vsr_tpu.ops.dynamic_filter``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.data.datasets import misr_target_index
from vsr_tpu.models.common import Conv, Conv3D
from vsr_tpu.ops.dynamic_filter import apply_dynamic_filters
from vsr_tpu.ops.pixel_shuffle import pixel_shuffle
from vsr_tpu.registry import register

_BACKBONES = {
    "_DenseLayer16": (3, 3, 32, 256),
    "_DenseLayer28": (9, 3, 16, 256),
    "_DenseLayer52": (21, 3, 16, 448),
}


class _DenseBlock(nn.Module):
    """BN-ReLU-1x1x1 conv - BN-ReLU-3x3x3 conv; ``pad_t=0`` shrinks T by 2."""

    growth: int
    pad_t: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = x.shape[-1]
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = Conv3D(f, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = Conv3D(self.growth, (3, 3, 3), padding=(self.pad_t, 1, 1),
                   dtype=self.dtype)(y)
        return y


class _DenseBackbone(nn.Module):
    backbone: str
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n1, n2, growth, tail_in = _BACKBONES[self.backbone]
        concat = x
        for _ in range(n1):
            y = _DenseBlock(growth, pad_t=1, dtype=self.dtype)(concat, train=train)
            concat = jnp.concatenate([concat, y], axis=-1)
        for _ in range(n2):
            y = _DenseBlock(growth, pad_t=0, dtype=self.dtype)(concat, train=train)
            # Trim the running concat's temporal extent to match the
            # shrunken block output (duf_net.py:126).
            concat = jnp.concatenate([concat[:, 1:-1], y], axis=-1)
        assert concat.shape[-1] == tail_in, (concat.shape, tail_in)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(concat)
        z = nn.relu(z)
        return Conv3D(256, (1, 3, 3), padding=(0, 1, 1), dtype=self.dtype)(z)


@register("net")
class DUFNet(nn.Module):
    in_channels: int
    out_channels: int
    num_frames: int
    size_filter: int
    upscale_factor: int
    backbone: str = "_DenseLayer16"
    use_pallas_filter: bool = False  # fused Pallas kernel (C=1, TPU)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, T, h, w, C) -> (N, H, W, C)."""
        if self.backbone not in _BACKBONES:
            raise ValueError(f"Unknown backbone {self.backbone}")
        n, t, h, w, c = x.shape
        assert t == self.num_frames
        target = x[:, misr_target_index(self.num_frames)]  # raw center frame

        head = Conv(64, 3, padding=1, dtype=self.dtype)
        feats = head(x.reshape(n * t, h, w, c)).reshape(n, t, h, w, 64)

        feats = _DenseBackbone(self.backbone, dtype=self.dtype)(feats, train=train)
        # (N, D', h, w, 256); D' = T - 6.

        k2 = self.size_filter**2
        r2 = self.upscale_factor**2

        # Filter generation branch.
        f = nn.relu(feats)
        f = Conv3D(512, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype)(f)
        f = nn.relu(f)
        f = Conv3D(k2 * r2, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype)(f)
        # (N, D', h, w, k2*r2) -> logits over (k2, r2), temporal slice 0.
        filter_logits = f[:, 0].reshape(n, h, w, k2, r2)

        # Residual branch.
        res = nn.relu(feats)
        res = Conv3D(256, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype)(res)
        res = nn.relu(res)
        res = Conv3D(self.in_channels * r2, (1, 1, 1), padding=(0, 0, 0),
                     dtype=self.dtype)(res)
        residual = pixel_shuffle(res[:, 0], self.upscale_factor)

        if self.use_pallas_filter and self.in_channels == 1:
            from vsr_tpu.ops.pallas_duf import duf_dynamic_filter_pallas

            out = duf_dynamic_filter_pallas(
                target[..., 0], filter_logits, self.size_filter, self.upscale_factor
            )[..., None]
        else:
            filters = nn.softmax(filter_logits, axis=3)
            out = apply_dynamic_filters(target, filters, self.upscale_factor)
        return out + residual
