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
    #: Hybrid precision (see Volume4DSRNet.carry_f32): f32 hidden carry,
    #: f32 resblock accumulator chain, f32 global skip — all convs bf16.
    carry_f32: bool = False
    #: Fold the final conv through the last 2D-in-3D shuffle (see
    #: Volume3DSRNet.fused_tail) — same param tree.
    fused_tail: bool = False

    @nn.compact
    def __call__(self, hidden, in_feat=None, mode: str = "full"):
        """``mode``: "full" = recurrence + upsample tail (one scan step);
        "recur" = recurrence only, returns ``(new_hidden, in_feat + x)``;
        "tail" = upsample tail only over a pre-stacked batch (``hidden``
        doubles as the y input). Module names are explicit so every mode
        creates the SAME param tree (checkpoints interchange across
        ``hoist_tail``)."""
        if mode == "tail":
            return self._tail(hidden)
        f = self.num_features
        # Under carry_f32 the hidden volume is CONSUMED at f32: in_feat
        # and hidden are both f32, so the 1x1 squeeze computes in f32
        # (dtype=None -> promoted dtype; a sliver of the step's FLOPs
        # next to the 3x3x3 resblocks) and the recurrence never rounds
        # the carry to bf16 — same design as FBlock (feedback.py).
        cat = jnp.concatenate([in_feat, hidden], axis=-1)
        x = Conv3D(f, (1, 1, 1), padding=(0, 0, 0),
                   dtype=None if self.carry_f32 else self.dtype,
                   name="Conv3D_0")(cat)
        for i in range(self.num_resblocks):
            x = _ResBlock3D(f, self.res_scale, dtype=self.dtype,
                            acc_f32=self.carry_f32,
                            name=f"_ResBlock3D_{i}")(x)
        new_hidden = x
        y = in_feat + x  # global feature skip (DRF pattern; f32 x f32 under carry_f32)
        if mode == "recur":
            return new_hidden, y
        return new_hidden, self._tail(y)

    def _tail(self, y):
        """Upsample tail (conv names continue the historical Conv3D_<k>
        numbering after the squeeze's Conv3D_0)."""
        f, r, k = self.num_features, self.upscale_factor, 1
        if math.log2(r).is_integer():
            stages, r_last = int(math.log2(r)), 2
        elif r == 3:
            stages, r_last = 1, 3
        else:
            raise NotImplementedError(f"upscale_factor={r}")
        if self.fused_tail and stages == 0:
            # f=1: no shuffle to fold through (see Volume3DSRNet).
            raise NotImplementedError(
                "fused_tail needs an upsampling tail (upscale_factor>=2)")
        for i in range(stages):
            y = Conv3D(r_last * r_last * f, (3, 3, 3), padding=(1, 1, 1),
                       dtype=self.dtype, name=f"Conv3D_{k}")(y)
            k += 1
            if i < stages - 1 or not self.fused_tail:
                y = _pixel_shuffle_2d_in_3d(y, r_last)
        if not self.fused_tail:
            return Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                          dtype=self.dtype, name=f"Conv3D_{k}")(y)
        out = Conv3D(self.out_channels, (3, 3, 3), padding=(1, 1, 1),
                     dtype=self.dtype, name=f"Conv3D_{k}",
                     fold_shuffle2d=r_last)(y)
        return _pixel_shuffle_2d_in_3d(out, r_last)


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
    #: Hybrid-precision training (VERDICT r3 weak #1): under
    #: ``dtype=bfloat16`` the hidden-volume carry, the resblock residual
    #: accumulator chain (res_scale-shrunk increments are exactly what
    #: bf16 accumulation loses), and the global skip stay float32 — the
    #: producing convs keep their MXU f32 accumulation
    #: (``Conv3D.out_dtype``), every conv still computes bf16. Same param
    #: tree; checkpoints interchange.
    carry_f32: bool = False
    #: Serving: hoist the upsample tail OUT of the T-scan — the scan
    #: carries only the recurrence (squeeze + resblocks) and emits the
    #: skip-added features, then the tail (upsample convs) runs ONCE
    #: batched over (N*T) instead of T times at batch N (the GPipe
    #: tail-hoist trick, parallel/pipeline.py). Identical math per
    #: sample and the SAME param tree; see scripts/
    #: profile_vol4d_serving.py for on-chip numbers.
    hoist_tail: bool = False
    #: Serving: additionally compute the final (thin) conv FOLDED through
    #: the last 2D-in-3D shuffle (Conv3D.fold_shuffle2d) so the HR
    #: intermediate never materializes. Same param tree.
    fused_tail: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (N, T, D, h, w, C) -> (N, T, D, h*r, w*r, C)."""
        n, t, d, h, w, c = x.shape
        carry_f32 = self.carry_f32 and self.dtype is not None
        in_feats = Conv3D(self.num_features, (3, 3, 3), padding=(1, 1, 1),
                          dtype=self.dtype,
                          out_dtype=jnp.float32 if carry_f32 else None)(
            x.reshape(n * t, d, h, w, c))
        in_feats = in_feats.reshape(n, t, d, h, w, self.num_features)
        feats_t = jnp.moveaxis(in_feats, 1, 0)  # (T, N, D, h, w, F)

        # remat: ``mode`` is a static (string) argument — arg index 3
        # counting self (flax nn.remat convention).
        step_cls = (nn.remat(_Vol4DStep, static_argnums=(3,))
                    if self.remat else _Vol4DStep)
        step = step_cls(
            self.num_features, self.num_resblocks, self.out_channels,
            self.upscale_factor, self.res_scale, dtype=self.dtype,
            carry_f32=carry_f32, fused_tail=self.fused_tail, name="step",
        )
        mode = "recur" if self.hoist_tail else "full"

        def body(mdl, hidden, in_feat):
            return mdl(hidden, in_feat, mode)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=min(self.unroll, t),
        )
        _, outputs = scan(step, feats_t[0], feats_t)
        if self.hoist_tail:
            # outputs: (T, N, D, h, w, F) skip-added features -> one
            # batched tail apply (same module instance = shared params).
            ys = jnp.moveaxis(outputs, 0, 1).reshape(
                n * t, d, h, w, self.num_features)
            out = step(ys, None, "tail")
            return out.reshape(n, t, *out.shape[1:])
        return jnp.moveaxis(outputs, 0, 1)
