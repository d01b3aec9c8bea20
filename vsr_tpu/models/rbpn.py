"""RBPN — Recurrent Back-Projection Network (MISR).

Parity with ``/root/reference/src/model/nets/rbp_net.py``: per-neighbor
recurrent back-projection. Each iteration runs the SISR path (a DBPN
up/down projection ladder) on the running feature state, the MISR path
(resblocks + deconv) on the [center, neighbor] pair features, applies the
error feedback ``h = h0 + res_feat2(h0 - h1)``, collects ``h``, and feeds
``res_feat3(h)`` back as the next state. All hidden states concat into a
reconstruction conv. (The reference variant feeds no optical-flow input —
``feat1`` sees just the stacked frame pair — and we match that.)

PReLU activations use torch's default init (0.25). The projection geometry
per upscale factor matches the reference table.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.data.datasets import misr_target_index
from vsr_tpu.models.common import Conv, ConvTranspose
from vsr_tpu.models.feedback import PROJECTION_PARAMS, check_upscale_factor
from vsr_tpu.registry import register


class _PReLU(nn.Module):
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda key: jnp.full((1,), self.init, jnp.float32))
        # Param stays f32; compute in x's dtype — an f32 alpha would promote
        # every bf16 activation to f32 (2x HBM + convert storms: the DRF
        # serving trace showed 17% of device time in add_convert fusions).
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class _ConvP(nn.Module):
    """Conv + PReLU (activation=None via ``act=False``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    act: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.features, self.kernel, strides=self.stride, padding=self.pad,
                 dtype=self.dtype)(x)
        return _PReLU()(y) if self.act else y


class _DeconvP(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    act: bool = True
    dtype: Any = None
    subpixel: bool = False

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose(self.features, self.kernel, self.stride, self.pad,
                          dtype=self.dtype, subpixel=self.subpixel)(x)
        return _PReLU()(y) if self.act else y


class _ResnetBlock(nn.Module):
    """conv-act-conv + skip, then act again. The reference's ResnetBlock
    (``rbp_net.py:212-257``) instantiates ONE nn.PReLU and applies it at both
    activation sites, so the two sites share a single alpha — mirrored here
    by reusing the same submodule instance."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        act = _PReLU()
        y = act(Conv(self.features, 3, padding=1, dtype=self.dtype)(x))
        y = Conv(self.features, 3, padding=1, dtype=self.dtype)(y)
        return act(y + x)


class _UpBlock(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x):
        h0 = _DeconvP(self.features, self.kernel, self.stride, self.pad,
                      dtype=self.dtype, subpixel=self.subpixel_deconv)(x)
        l0 = _ConvP(self.features, self.kernel, self.stride, self.pad,
                    dtype=self.dtype)(h0)
        h1 = _DeconvP(self.features, self.kernel, self.stride, self.pad,
                      dtype=self.dtype, subpixel=self.subpixel_deconv)(l0 - x)
        return h1 + h0


class _DownBlock(nn.Module):
    features: int
    kernel: int
    stride: int
    pad: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x):
        l0 = _ConvP(self.features, self.kernel, self.stride, self.pad,
                    dtype=self.dtype)(x)
        h0 = _DeconvP(self.features, self.kernel, self.stride, self.pad,
                      dtype=self.dtype, subpixel=self.subpixel_deconv)(l0)
        l1 = _ConvP(self.features, self.kernel, self.stride, self.pad,
                    dtype=self.dtype)(h0 - x)
        return l1 + l0


class DBPNet(nn.Module):
    """3-stage DBPN ladder (``rbp_net.py:94-139``)."""

    feat: int
    num_stages: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p = PROJECTION_PARAMS[self.upscale_factor]
        sp = self.subpixel_deconv
        x = _ConvP(self.feat, 1, 1, 0, dtype=self.dtype)(x)
        h1 = _UpBlock(self.feat, k, s, p, dtype=self.dtype, subpixel_deconv=sp)(x)
        h2 = _UpBlock(self.feat, k, s, p, dtype=self.dtype, subpixel_deconv=sp)(
            _DownBlock(self.feat, k, s, p, dtype=self.dtype, subpixel_deconv=sp)(h1)
        )
        h3 = _UpBlock(self.feat, k, s, p, dtype=self.dtype, subpixel_deconv=sp)(
            _DownBlock(self.feat, k, s, p, dtype=self.dtype, subpixel_deconv=sp)(h2)
        )
        return _ConvP(self.feat, 1, 1, 0, act=False, dtype=self.dtype)(
            jnp.concatenate([h3, h2, h1], axis=-1)
        )


class _ResChain(nn.Module):
    features: int
    num_resblocks: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_resblocks):
            x = _ResnetBlock(self.features, dtype=self.dtype)(x)
        return x


@register("net")
class RBPNet(nn.Module):
    in_channels: int
    out_channels: int
    base_filter: int
    feat: int
    num_stages: int
    num_resblocks: int
    num_frames: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, T, h, w, C) -> (N, H, W, C)."""
        check_upscale_factor(self.upscale_factor)
        k, s, p = PROJECTION_PARAMS[self.upscale_factor]
        t = misr_target_index(self.num_frames)
        center = x[:, t]
        neighbors = [x[:, i] for i in range(self.num_frames) if i != t]

        feat0 = _ConvP(self.base_filter, 3, 1, 1, dtype=self.dtype)
        feat1 = _ConvP(self.base_filter, 3, 1, 1, dtype=self.dtype)
        dbp_net = DBPNet(self.feat, self.num_stages, self.upscale_factor,
                         dtype=self.dtype,
                         subpixel_deconv=self.subpixel_deconv)
        res1_chain = _ResChain(self.base_filter, self.num_resblocks, dtype=self.dtype)
        res1_up = _DeconvP(self.feat, k, s, p, dtype=self.dtype,
                           subpixel=self.subpixel_deconv)
        res2_chain = _ResChain(self.feat, self.num_resblocks, dtype=self.dtype)
        res2_conv = _ConvP(self.feat, 3, 1, 1, dtype=self.dtype)
        res3_chain = _ResChain(self.feat, self.num_resblocks, dtype=self.dtype)
        res3_down = _ConvP(self.base_filter, k, s, p, dtype=self.dtype)

        feat_input = feat0(center)
        hidden = []
        for nbr in neighbors:
            pair = feat1(jnp.concatenate([center, nbr], axis=-1))
            h0 = dbp_net(feat_input)
            h1 = res1_up(res1_chain(pair))
            e = res2_conv(res2_chain(h0 - h1))
            h = h0 + e
            hidden.append(h)
            feat_input = res3_down(res3_chain(h))

        out = jnp.concatenate(hidden, axis=-1)
        return _ConvP(self.out_channels, 3, 1, 1, act=False, dtype=self.dtype)(out)
