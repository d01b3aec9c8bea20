"""SRFBN — Super-Resolution Feedback Network (SISR, iterative).

Parity with ``/root/reference/src/model/nets/srfb_net.py``: ``num_steps``
feedback iterations over one LR input; the feedback block's hidden state is
reset to the extracted features at step 0 and carried across steps; each step
emits a bilinear-upsampled global residual output; returns all step outputs.

TPU-first: the Python step loop becomes ``lax.scan`` (via ``nn.scan``) with
parameters broadcast across steps — one compiled step body instead of an
unrolled graph — and the constant per-step inputs (LR features, upsampled
input) enter the scan as broadcast operands. Output is a stacked
``(num_steps, N, H, W, C)`` array instead of a Python list.
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from vsr_tpu.models.common import Conv, ConvTranspose
from vsr_tpu.models.feedback import (
    FBlock,
    InBlock,
    PROJECTION_PARAMS,
    PReLU,
    check_upscale_factor,
)
from vsr_tpu.ops.upsample import upsample_bilinear
from vsr_tpu.registry import register


class _RBlock(nn.Module):
    """Reconstruction: strided deconv + 3x3 conv (``srfb_net.py:137-151``)."""

    out_channels: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p = PROJECTION_PARAMS[self.upscale_factor]
        x = ConvTranspose(x.shape[-1], k, s, p, dtype=self.dtype,
                          subpixel=self.subpixel_deconv)(x)
        x = PReLU()(x)
        return Conv(self.out_channels, 3, padding=1, dtype=self.dtype)(x)


class _SRFBStep(nn.Module):
    num_features: int
    num_groups: int
    out_channels: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False
    fused_squeeze: bool = False
    #: f32 feedback carry under bf16 compute (see FBlock.carry_f32).
    carry_f32: bool = False

    @nn.compact
    def __call__(self, hidden, feat, upscaled_input):
        f = FBlock(self.num_features, self.num_groups, self.upscale_factor,
                   dtype=self.dtype,
                   subpixel_deconv=self.subpixel_deconv,
                   fused_squeeze=self.fused_squeeze,
                   carry_f32=self.carry_f32)(feat, hidden)
        residual = _RBlock(self.out_channels, self.upscale_factor, dtype=self.dtype,
                           subpixel_deconv=self.subpixel_deconv)(f)
        return f, upscaled_input + residual


@register("net")
class SRFBNet(nn.Module):
    in_channels: int
    out_channels: int
    num_steps: int
    num_features: int
    num_groups: int
    upscale_factor: int
    dtype: Any = None
    #: serve the k6s2-family deconvs as exact sub-pixel phase convs
    #: (ops/subpixel.py) — same params/results; measured ~0.87x end to end
    #: (recorded negative; A/B harness).
    subpixel_deconv: bool = False
    #: fuse the FBlock ladder concat+1x1 squeezes (Pallas; exact).
    fused_squeeze: bool = False
    #: lax.scan ``unroll`` for the feedback loop (exact; straight-lines the
    #: num_steps iterations). Training knob: the scan backward's activation
    #: stash is dynamic_update_slice traffic that unrolling lets XLA fuse
    #: (scripts/probe_drf_train_scan.py measured +25% on DRFNet's frame
    #: scan); serving keeps 1.
    unroll: int = 1
    #: Hybrid-precision training: f32 feedback carry + f32 skip features
    #: under bf16 compute (VERDICT r3 weak #1; see DRFSISRNet.carry_f32).
    #: Same parameter tree — checkpoints interchange.
    carry_f32: bool = False

    @nn.compact
    def __call__(self, x):
        check_upscale_factor(self.upscale_factor)
        from vsr_tpu.models.drf import _check_carry_f32

        carry_f32 = _check_carry_f32(self)
        feat = InBlock(self.num_features, dtype=self.dtype,
                       out_f32=carry_f32)(x)
        upscaled = upsample_bilinear(x, scale=self.upscale_factor, align_corners=False)

        scan = nn.scan(
            _SRFBStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.num_steps,
            unroll=min(self.unroll, self.num_steps),
        )
        _, outputs = scan(
            self.num_features, self.num_groups, self.out_channels,
            self.upscale_factor, dtype=self.dtype,
            subpixel_deconv=self.subpixel_deconv,
            fused_squeeze=self.fused_squeeze,
            carry_f32=carry_f32,
        )(feat, feat, upscaled)
        return outputs  # (num_steps, N, H, W, C)
