"""EDVR — Enhanced Deformable Video Restoration (MISR, x4).

Parity with ``/root/reference/src/model/nets/edvr_net/EDVR_arch.py``:
optional pre-deblur pyramid, 3-level feature pyramid, PCD alignment
(cascaded modulated deformable conv with offsets predicted from concatenated
features, L3->L2->L1 plus a final cascading DCN), TSA fusion (temporal
dot-product attention + spatial attention pyramid), reconstruction resblocks,
two x2 pixel-shuffles and a bilinear global residual. Upscale is x4 by
construction, as in the reference.

The DCN packs replace the reference's CUDA extension with the XLA
gather+GEMM op in ``vsr_tpu.ops.deform_conv`` (offset/mask convs
zero-initialized per ``dcn/deform_conv.py:257-268``).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vsr_tpu.models.common import Conv
from vsr_tpu.ops.deform_conv import deform_conv2d
from vsr_tpu.ops.upsample import upsample_bilinear
from vsr_tpu.registry import register


def _scaled_kaiming(scale: float):
    """torch kaiming_normal_ (fan_in, relu) scaled by ``scale``
    (arch_util.initialize_weights)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = math.sqrt(2.0 / fan_in) * scale
        return jax.random.normal(key, shape, dtype) * std

    return init


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv + identity, 0.1-scaled kaiming init
    (``arch_util.py:33-53``)."""

    nf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda: nn.Conv(self.nf, (3, 3), padding=[(1, 1), (1, 1)],
                               kernel_init=_scaled_kaiming(0.1),
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype)
        y = nn.relu(conv()(x))
        y = conv()(y)
        return x + y


class _PermutedOutConv(nn.Conv):
    """nn.Conv whose KERNEL output channels are permuted at apply time.

    The DCN packs' offset conv stores its channels in the reference's
    s-major order (all y, all x, all mask — the transplant/checkpoint
    contract), but the sampler wants (dg, k2, 2)-interleaved offsets.
    Permuting the ACTIVATION is a real (N*Ho*Wo*3*dg*k2) transpose per
    frame — the EDVR trace's 'data formatting' slice; permuting the
    KERNEL's cout axis instead costs an O(|weight|) gather and makes the
    downstream unpack pure trailing-dim reshapes. Bitwise-identical
    outputs (same dot products, different write positions). Subclassing
    keeps the param path/layout of the nn.Conv it replaces."""

    out_perm: tuple = ()

    def param(self, name, *args, **kwargs):
        p = super().param(name, *args, **kwargs)
        if len(self.out_perm) and name in ("kernel", "bias"):
            p = p[..., jnp.asarray(self.out_perm, jnp.int32)]
        return p


def _pack_perm(dg: int, k2: int, n_offset_axes: int) -> tuple:
    """cout permutation: s-major reference layout -> (dg, k2, s)-
    interleaved offsets [+ trailing mask block unchanged]."""
    perm = [s * dg * k2 + g * k2 + j
            for g in range(dg) for j in range(k2)
            for s in range(n_offset_axes)]
    mask_base = n_offset_axes * dg * k2
    return tuple(perm) + tuple(mask_base + c for c in range(dg * k2))


class ModulatedDeformConvPack(nn.Module):
    """DCNv2 with offsets+mask predicted by a zero-initialized conv.

    ``extra_offset_mask=True`` (the EDVR mode): ``__call__(x, extra)``
    predicts from ``extra`` instead of ``x``.
    """

    features: int
    deformable_groups: int = 8
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, extra=None):
        src = extra if extra is not None else x
        k = self.kernel_size
        k2 = k * k
        dg = self.deformable_groups
        raw = _PermutedOutConv(
            3 * dg * k2, (k, k), strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, out_perm=_pack_perm(dg, k2, 2),
            name="Conv_0",  # checkpoint-path parity with the plain nn.Conv
        )(src)
        n, ho, wo, _ = raw.shape
        # The kernel permutation laid the channels out so both unpacks are
        # free trailing-dim reshapes (no activation transpose).
        offsets = raw[..., : 2 * dg * k2].reshape(n, ho, wo, dg, k2, 2)
        mask = jax.nn.sigmoid(
            raw[..., 2 * dg * k2:].reshape(n, ho, wo, dg, k2))

        weight = self.param(
            "weight",
            lambda key: _dcn_weight_init(key, (k, k, x.shape[-1], self.features)),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # Params stay f32; compute in x's dtype (f32 operands would promote
        # the whole bf16 im2col/GEMM to f32 — see PReLU note, feedback.py).
        return deform_conv2d(
            x, offsets.astype(x.dtype), weight.astype(x.dtype),
            bias=bias.astype(x.dtype), mask=mask.astype(x.dtype),
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )


def _dcn_weight_init(key, shape):
    """torch DCN reset_parameters: U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class DeformConvPack(nn.Module):
    """DCNv1: offsets only, zero-initialized offset conv."""

    features: int
    deformable_groups: int = 1
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, extra=None):
        src = extra if extra is not None else x
        k = self.kernel_size
        k2 = k * k
        dg = self.deformable_groups
        raw = _PermutedOutConv(
            2 * dg * k2, (k, k), strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, out_perm=_pack_perm(dg, k2, 2)[: 2 * dg * k2],
            name="Conv_0",
        )(src)
        n, ho, wo, _ = raw.shape
        offsets = raw.reshape(n, ho, wo, dg, k2, 2)

        weight = self.param(
            "weight",
            lambda key: _dcn_weight_init(key, (k, k, x.shape[-1], self.features)),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return deform_conv2d(
            x, offsets.astype(x.dtype), weight.astype(x.dtype),
            bias=bias.astype(x.dtype), mask=None,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class PCDAlign(nn.Module):
    """Pyramid-Cascading-Deformable alignment (``EDVR_arch.py:191-251``)."""

    nf: int = 64
    groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, nbr_l, ref_l):
        nf = self.nf
        conv = lambda: Conv(nf, 3, padding=1, dtype=self.dtype)
        dcn = lambda: ModulatedDeformConvPack(nf, self.groups, dtype=self.dtype)

        # L3
        l3_off = jnp.concatenate([nbr_l[2], ref_l[2]], axis=-1)
        l3_off = _lrelu(conv()(l3_off))
        l3_off = _lrelu(conv()(l3_off))
        l3_fea = _lrelu(dcn()(nbr_l[2], l3_off))
        # L2
        l2_off = jnp.concatenate([nbr_l[1], ref_l[1]], axis=-1)
        l2_off = _lrelu(conv()(l2_off))
        l3_off_up = upsample_bilinear(l3_off, scale=2, align_corners=False)
        l2_off = _lrelu(conv()(jnp.concatenate([l2_off, l3_off_up * 2], axis=-1)))
        l2_off = _lrelu(conv()(l2_off))
        l2_fea = dcn()(nbr_l[1], l2_off)
        l3_fea_up = upsample_bilinear(l3_fea, scale=2, align_corners=False)
        l2_fea = _lrelu(conv()(jnp.concatenate([l2_fea, l3_fea_up], axis=-1)))
        # L1
        l1_off = jnp.concatenate([nbr_l[0], ref_l[0]], axis=-1)
        l1_off = _lrelu(conv()(l1_off))
        l2_off_up = upsample_bilinear(l2_off, scale=2, align_corners=False)
        l1_off = _lrelu(conv()(jnp.concatenate([l1_off, l2_off_up * 2], axis=-1)))
        l1_off = _lrelu(conv()(l1_off))
        l1_fea = dcn()(nbr_l[0], l1_off)
        l2_fea_up = upsample_bilinear(l2_fea, scale=2, align_corners=False)
        l1_fea = conv()(jnp.concatenate([l1_fea, l2_fea_up], axis=-1))
        # Cascading
        off = jnp.concatenate([l1_fea, ref_l[0]], axis=-1)
        off = _lrelu(conv()(off))
        off = _lrelu(conv()(off))
        return _lrelu(dcn()(l1_fea, off))


def _pool(x, op):
    """torch {Max,Avg}Pool2d(3, stride=2, padding=1)."""
    if op == "max":
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    # torch AvgPool2d counts padded zeros (count_include_pad=True default).
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / 9.0


class TSAFusion(nn.Module):
    """Temporal-Spatial Attention fusion (``EDVR_arch.py:254-321``)."""

    nf: int = 64
    nframes: int = 5
    center: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, aligned):
        """aligned: (N, T, H, W, nf)."""
        n, t, h, w, nf = aligned.shape
        emb_ref = Conv(nf, 3, padding=1, dtype=self.dtype)(aligned[:, self.center])
        emb = Conv(nf, 3, padding=1, dtype=self.dtype)(
            aligned.reshape(n * t, h, w, nf)
        ).reshape(n, t, h, w, nf)

        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (N, T, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None]  # (N, T, H, W, 1)
        weighted = (aligned * cor_prob).transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * nf)

        fea = _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(weighted))

        att = _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(weighted))
        att_max, att_avg = _pool(att, "max"), _pool(att, "avg")
        att = _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(
            jnp.concatenate([att_max, att_avg], axis=-1)))
        att_l = _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(att))
        att_l_max, att_l_avg = _pool(att_l, "max"), _pool(att_l, "avg")
        att_l = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(
            jnp.concatenate([att_l_max, att_l_avg], axis=-1)))
        att_l = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(att_l))
        att_l = upsample_bilinear(att_l, scale=2, align_corners=False)

        att = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(att))
        att = att + att_l
        att = _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(att))
        att = upsample_bilinear(att, scale=2, align_corners=False)
        att = Conv(nf, 3, padding=1, dtype=self.dtype)(att)
        att_add = Conv(nf, 1, padding=0, dtype=self.dtype)(
            _lrelu(Conv(nf, 1, padding=0, dtype=self.dtype)(att))
        )
        att = jax.nn.sigmoid(att)
        return fea * att * 2 + att_add


class PredeblurPyramid(nn.Module):
    """Pre-deblur resblock pyramid (``EDVR_arch.py:148-188``)."""

    nf: int = 128
    hr_in: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        rb = lambda: ResidualBlockNoBN(self.nf, dtype=self.dtype)
        if self.hr_in:
            f = _lrelu(Conv(self.nf, 3, padding=1, dtype=self.dtype)(x))
            f = _lrelu(Conv(self.nf, 3, strides=2, padding=1, dtype=self.dtype)(f))
            l1 = _lrelu(Conv(self.nf, 3, strides=2, padding=1, dtype=self.dtype)(f))
        else:
            l1 = _lrelu(Conv(self.nf, 3, padding=1, dtype=self.dtype)(x))
        l2 = _lrelu(Conv(self.nf, 3, strides=2, padding=1, dtype=self.dtype)(l1))
        l3 = _lrelu(Conv(self.nf, 3, strides=2, padding=1, dtype=self.dtype)(l2))
        l3 = upsample_bilinear(rb()(l3), scale=2, align_corners=False)
        l2 = rb()(l2) + l3
        l2 = upsample_bilinear(rb()(l2), scale=2, align_corners=False)
        l1 = rb()(rb()(l1)) + l2
        return rb()(rb()(rb()(l1)))


@register("net")
class EDVRNet(nn.Module):
    in_channels: int
    out_channels: int
    nf: int = 64
    nframes: int = 5
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 10
    center: int | None = None
    predeblur: bool = False
    HR_in: bool = False
    w_TSA: bool = True
    fused_tail: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (N, T, h, w, C) -> (N, 4h, 4w, C) (x4 like the reference)."""
        nf = self.nf
        center = self.nframes // 2 if self.center is None else self.center
        n, t, h, w, c = x.shape
        assert t == self.nframes

        h_diff = (4 - h % 4) % 4
        w_diff = (4 - w % 4) % 4
        padded = h_diff or w_diff
        if padded:
            pad = ((0, 0), (0, 0), (h_diff // 2, h_diff - h_diff // 2),
                   (w_diff // 2, w_diff - w_diff // 2), (0, 0))
            x = jnp.pad(x, pad, constant_values=x.min())
            h, w = x.shape[2], x.shape[3]
        x_center = x[:, center]

        flat = x.reshape(n * t, h, w, c)
        if self.predeblur:
            l1 = PredeblurPyramid(nf=nf, hr_in=self.HR_in, dtype=self.dtype)(flat)
            l1 = Conv(nf, 1, padding=0, dtype=self.dtype)(l1)
            if self.HR_in:
                h, w = h // 4, w // 4
        elif self.HR_in:
            l1 = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(flat))
            l1 = _lrelu(Conv(nf, 3, strides=2, padding=1, dtype=self.dtype)(l1))
            l1 = _lrelu(Conv(nf, 3, strides=2, padding=1, dtype=self.dtype)(l1))
            h, w = h // 4, w // 4
        else:
            l1 = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(flat))
        for _ in range(self.front_RBs):
            l1 = ResidualBlockNoBN(nf, dtype=self.dtype)(l1)
        l2 = _lrelu(Conv(nf, 3, strides=2, padding=1, dtype=self.dtype)(l1))
        l2 = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(l2))
        l3 = _lrelu(Conv(nf, 3, strides=2, padding=1, dtype=self.dtype)(l2))
        l3 = _lrelu(Conv(nf, 3, padding=1, dtype=self.dtype)(l3))

        l1 = l1.reshape(n, t, h, w, nf)
        l2 = l2.reshape(n, t, h // 2, w // 2, nf)
        l3 = l3.reshape(n, t, h // 4, w // 4, nf)

        ref_l = [l1[:, center], l2[:, center], l3[:, center]]
        pcd = PCDAlign(nf=nf, groups=self.groups, dtype=self.dtype)
        # Per-frame loop ON PURPOSE (negative result, round 4): batching
        # all T alignments into one t-x-bigger PCD call (fold T into N,
        # broadcast the ref features) is bitwise-equal math but measured
        # 0.85x on chip at the serving protocol — the broadcast ref
        # concats add HBM traffic and XLA already fuses the unrolled
        # per-frame chains; the t small GEMM chains beat one big one.
        aligned = jnp.stack(
            [pcd([l1[:, i], l2[:, i], l3[:, i]], ref_l) for i in range(t)],
            axis=1,
        )  # (N, T, H, W, nf)

        if self.w_TSA:
            fea = TSAFusion(nf=nf, nframes=self.nframes, center=center,
                            dtype=self.dtype)(aligned)
        else:
            fea = Conv(nf, 1, padding=0, dtype=self.dtype)(
                aligned.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * nf)
            )

        out = fea
        for _ in range(self.back_RBs):
            out = ResidualBlockNoBN(nf, dtype=self.dtype)(out)
        from vsr_tpu.models.common import FoldableConv
        from vsr_tpu.ops.pixel_shuffle import pixel_shuffle

        out = _lrelu(pixel_shuffle(Conv(nf * 4, 3, padding=1, dtype=self.dtype)(out), 2))
        up2 = Conv(64 * 4, 3, padding=1, dtype=self.dtype)(out)
        hr_conv = FoldableConv(64, 3, factor=2, dtype=self.dtype)
        last_conv = FoldableConv(self.out_channels, 3, factor=2, dtype=self.dtype)
        if self.fused_tail:
            # lrelu commutes with pixel_shuffle; HRconv and conv_last fold
            # through the second shuffle and chain at HALF resolution with
            # 4x-wider channels (ops/fused_tail.py) — the full-resolution
            # 64-channel intermediates never materialize.
            y = _lrelu(up2)
            y = _lrelu(hr_conv(y, folded=True))
            out = pixel_shuffle(last_conv(y, folded=True), 2)
        else:
            out = _lrelu(pixel_shuffle(up2, 2))
            out = _lrelu(hr_conv(out))
            out = last_conv(out)

        if self.HR_in:
            base = x_center
        else:
            base = upsample_bilinear(x_center, scale=4, align_corners=False)
        out = out + base

        if padded:
            out = out[:, h_diff // 2 * 4 : out.shape[1] - (h_diff - h_diff // 2) * 4,
                      w_diff // 2 * 4 : out.shape[2] - (w_diff - w_diff // 2) * 4]
        return out
