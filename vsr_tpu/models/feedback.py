"""Shared blocks of the feedback-network family (SRFBN / DRF-SISR / DRF).

The reference duplicates the feedback block verbatim across
``srfb_net.py:62-134`` and ``drf_sisr_net.py:62-134`` (and ``drf_net.py``);
here it lives once. The block is a dense up/down projection ladder: each
group consumes the concat of all previous LR (resp. HR) features through a
1x1 squeeze, projects up with a strided deconv and back down with a strided
conv, and the outputs of all groups concat into a 1x1 fuse.

The per-upscale-factor projection geometry (kernel, stride, padding) matches
the reference table (``srfb_net.py:71-78``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.models.common import Conv, ConvTranspose


PROJECTION_PARAMS = {2: (6, 2, 2), 3: (7, 3, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


def check_upscale_factor(factor: int) -> None:
    if factor not in PROJECTION_PARAMS:
        raise ValueError(f"The upscale factor should be 2, 3, 4 or 8. Got {factor}.")


class PReLU(nn.Module):
    """torch nn.PReLU(num_parameters=1, init=0.2) equivalent."""

    init: float = 0.2

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.full((1,), self.init, jnp.float32))
        # Param stays f32; compute in x's dtype — an f32 alpha would promote
        # every bf16 activation to f32 (2x HBM + convert storms: the DRF
        # serving trace showed 17% of device time in add_convert fusions).
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class InBlock(nn.Module):
    """3x3 expand (4F) -> PReLU -> 1x1 squeeze (F) -> PReLU. Used as the LR
    feature extraction block of SRFBN and the input block of DRF."""

    num_features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv(4 * self.num_features, 3, padding=1, dtype=self.dtype)(x)
        x = PReLU()(x)
        x = Conv(self.num_features, 1, padding=0, dtype=self.dtype)(x)
        x = PReLU()(x)
        return x


class FBlock(nn.Module):
    """The feedback block: ``__call__(features, hidden) -> new features``."""

    num_features: int
    num_groups: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x, hidden):
        f = self.num_features
        k, s, p = PROJECTION_PARAMS[self.upscale_factor]

        feats = jnp.concatenate([x, hidden], axis=-1)
        lr = Conv(f, 1, padding=0, dtype=self.dtype)(feats)
        lr = PReLU()(lr)

        lr_list, hr_list = [lr], []
        for i in range(self.num_groups):
            concat_lr = jnp.concatenate(lr_list, axis=-1)
            if i == 0:
                hr = ConvTranspose(f, k, s, p, dtype=self.dtype,
                                   subpixel=self.subpixel_deconv)(concat_lr)
                hr = PReLU()(hr)
            else:
                z = Conv(f, 1, padding=0, dtype=self.dtype)(concat_lr)
                z = PReLU()(z)
                hr = ConvTranspose(f, k, s, p, dtype=self.dtype,
                                   subpixel=self.subpixel_deconv)(z)
                hr = PReLU()(hr)
            hr_list.append(hr)

            concat_hr = jnp.concatenate(hr_list, axis=-1)
            if i == 0:
                down = Conv(f, k, strides=s, padding=p, dtype=self.dtype)(concat_hr)
                down = PReLU()(down)
            else:
                z = Conv(f, 1, padding=0, dtype=self.dtype)(concat_hr)
                z = PReLU()(z)
                down = Conv(f, k, strides=s, padding=p, dtype=self.dtype)(z)
                down = PReLU()(down)
            lr_list.append(down)

        out = jnp.concatenate(lr_list[1:], axis=-1)
        out = Conv(f, 1, padding=0, dtype=self.dtype)(out)
        out = PReLU()(out)
        return out
