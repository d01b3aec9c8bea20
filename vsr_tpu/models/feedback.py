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
    feature extraction block of SRFBN and the input block of DRF.

    ``out_f32``: the squeeze conv keeps its MXU f32 accumulation
    (``Conv.out_dtype``) so the returned features — the global-skip
    accumulator the recurrent nets add every step's hidden state to — stay
    float32 under bf16 compute (hybrid-precision training, ``carry_f32``).
    """

    num_features: int
    dtype: Any = None
    out_f32: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(4 * self.num_features, 3, padding=1, dtype=self.dtype)(x)
        x = PReLU()(x)
        x = Conv(self.num_features, 1, padding=0, dtype=self.dtype,
                 out_dtype=jnp.float32 if self.out_f32 else None)(x)
        x = PReLU()(x)
        return x


class FBlock(nn.Module):
    """The feedback block: ``__call__(features, hidden) -> new features``."""

    num_features: int
    num_groups: int
    upscale_factor: int
    dtype: Any = None
    subpixel_deconv: bool = False
    #: fuse the ladder's concat+1x1 squeezes into one Pallas kernel each —
    #: the concats never hit HBM (ops/fused_squeeze.py). Exact (same
    #: params); opt-in for serving/training alike.
    fused_squeeze: bool = False
    #: Hybrid-precision recurrence (bf16 compute, f32 carry): the OUTPUT
    #: squeeze keeps its MXU f32 accumulation (``Conv.out_dtype``) so the
    #: hidden state returned to the scan carry is float32, while every
    #: conv still runs bf16 (inputs cast down explicitly at entry — no
    #: dtype leak into the ladder). Identical parameter tree.
    carry_f32: bool = False

    def _squeeze(self, parts, f, out_dtype=None, compute_dtype="default"):
        """concat(parts) -> 1x1 conv, fused or via materialized concat.
        Creates the SAME Conv module either way (checkpoint parity)."""
        dtype = self.dtype if compute_dtype == "default" else compute_dtype
        if self.fused_squeeze and len(parts) > 1:
            if out_dtype is not None or dtype is not self.dtype:
                raise NotImplementedError(
                    "carry_f32 does not compose with fused_squeeze (the "
                    "Pallas concat-matmul kernel emits the compute dtype)")
            return Conv(f, 1, padding=0, dtype=self.dtype,
                        fused_list=True)(tuple(parts))
        return Conv(f, 1, padding=0, dtype=dtype, out_dtype=out_dtype)(
            parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1))

    @nn.compact
    def __call__(self, x, hidden):
        f = self.num_features
        k, s, p = PROJECTION_PARAMS[self.upscale_factor]

        hybrid = self.carry_f32 and self.dtype is not None
        if hybrid:
            # The f32 carry is CONSUMED at f32: the input squeeze (a 1x1
            # conv, a sliver of the step's FLOPs next to the k6s2 ladder)
            # computes in f32 so the recurrence never rounds the hidden
            # state to bf16 — the downcast happens once, after the
            # squeeze, on the mixed features entering the bf16 ladder.
            lr = self._squeeze([x, hidden], f, compute_dtype=None)
        else:
            lr = self._squeeze([x, hidden], f)
        lr = PReLU()(lr)
        if hybrid:
            lr = lr.astype(self.dtype)

        lr_list, hr_list = [lr], []
        for i in range(self.num_groups):
            if i == 0:
                hr = ConvTranspose(f, k, s, p, dtype=self.dtype,
                                   subpixel=self.subpixel_deconv)(lr_list[0])
                hr = PReLU()(hr)
            else:
                z = self._squeeze(lr_list, f)
                z = PReLU()(z)
                hr = ConvTranspose(f, k, s, p, dtype=self.dtype,
                                   subpixel=self.subpixel_deconv)(z)
                hr = PReLU()(hr)
            hr_list.append(hr)

            if i == 0:
                down = Conv(f, k, strides=s, padding=p, dtype=self.dtype)(hr_list[0])
                down = PReLU()(down)
            else:
                z = self._squeeze(hr_list, f)
                z = PReLU()(z)
                down = Conv(f, k, strides=s, padding=p, dtype=self.dtype)(z)
                down = PReLU()(down)
            lr_list.append(down)

        out = self._squeeze(
            lr_list[1:], f,
            out_dtype=jnp.float32 if (self.carry_f32 and
                                      self.dtype is not None) else None)
        out = PReLU()(out)  # computes in out's dtype (f32 under carry_f32)
        return out
