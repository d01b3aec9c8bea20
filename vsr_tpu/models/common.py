"""Shared model building blocks (flax.linen, channels-last).

Initialization follows torch's Conv2d defaults (kaiming-uniform with
a=sqrt(5), i.e. U(+-sqrt(1/fan_in)), bias U(+-1/sqrt(fan_in))) so training
dynamics match the reference nets, which rely on torch defaults except where
they call explicit initializers.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _conv_fan_in(shape: Sequence[int]) -> int:
    # Flax conv kernel shape: (*window, in_features, out_features).
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return receptive * shape[-2]


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-sqrt(1/fan_in), sqrt(1/fan_in)) — torch kaiming_uniform(a=sqrt(5))."""
    bound = math.sqrt(1.0 / _conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def make_accum_conv(out_dtype):
    """A ``conv_general_dilated`` replacement that emits ``out_dtype``
    via ``preferred_element_type`` — with bf16 operands the MXU's native
    f32 accumulation reaches the output with no extra matmul cost.

    Wrapped in a custom VJP because jax's conv transpose rule would mix
    the f32 cotangent with the bf16 operands (dtype error): the backward
    here is the STANDARD compute-dtype conv backward (two transposed
    convs via ``jax.linear_transpose``, cotangent cast down first) —
    bit-identical gradients to the plain bf16 conv path, so the flag is
    purely a forward-precision upgrade.

    REVERSE-MODE ONLY: ``jax.custom_vjp`` makes forward-mode AD
    (``jax.jvp`` / ``jax.linearize``) through any ``carry_f32`` net fail
    with a custom_vjp error. Training and serving never use jvp; if
    jvp-based tooling ever needs these nets, run them with
    ``carry_f32=False`` (same params, plain-dtype carries)."""

    def conv_fn(lhs, rhs, *args, **kw):
        def low(l, r):
            return jax.lax.conv_general_dilated(l, r, *args, **kw)

        @jax.custom_vjp
        def conv(l, r):
            return jax.lax.conv_general_dilated(
                l, r, *args,
                **dict(kw, preferred_element_type=out_dtype))

        def fwd(l, r):
            return conv(l, r), (l, r)

        def bwd(res, g):
            l, r = res
            g = g.astype(jnp.result_type(l.dtype, r.dtype))
            dl = jax.linear_transpose(lambda t: low(t, r), l)(g)[0]
            dr = jax.linear_transpose(lambda t: low(l, t), r)(g)[0]
            return dl, dr

        conv.defvjp(fwd, bwd)
        return conv(lhs, rhs)

    return conv_fn


class Conv(nn.Module):
    """2D conv, NHWC, torch-default init, SAME-style explicit padding.

    ``padding`` is in pixels per spatial dim (torch convention), so
    ``kernel=3, padding=1`` preserves the spatial size.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int | tuple[int, int] = 1
    padding: int | tuple[int, int] | str = 1
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = None
    #: 1x1 convs only: __call__ takes a TUPLE of inputs and fuses the
    #: channel concat into the conv (Pallas kernel, HBM concat eliminated).
    fused_list: bool = False
    #: Emit the conv result in this dtype WITHOUT an intermediate downcast
    #: (``preferred_element_type``): with ``dtype=bfloat16,
    #: out_dtype=float32`` the MXU's native f32 accumulation is kept —
    #: higher-precision output at bf16 compute cost. Used by the hybrid-
    #: precision recurrent carries (``carry_f32``).
    out_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.fused_list:
            assert self.kernel_size == 1 and self.strides == 1
            cin = sum(a.shape[-1] for a in x)
            return _FusedSqueezeConv(
                features=self.features,
                kernel_size=(1, 1),
                kernel_init=torch_kernel_init,
                bias_init=make_torch_bias_init(cin),
                dtype=self.dtype,
                name="Conv_0",  # checkpoint-path parity with nn.Conv below
            )(x)
        k = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        s = self.strides if isinstance(self.strides, tuple) else (self.strides,) * 2
        if isinstance(self.padding, str):
            pad: Any = self.padding
        else:
            p = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2
            pad = [(p[0], p[0]), (p[1], p[1])]
        fan_in = k[0] * k[1] * (x.shape[-1] // self.feature_group_count)
        conv_fn = (make_accum_conv(self.out_dtype)
                   if self.out_dtype is not None else None)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            conv_general_dilated=conv_fn,
        )(x)


class _FusedSqueezeConv(nn.Conv):
    """nn.Conv(1x1) whose forward takes a TUPLE of inputs and computes
    ``concat(xs, -1) @ W + b`` via the Pallas fused-squeeze kernel
    (ops/fused_squeeze.py) — the concat never materializes in HBM.
    Identical params (kernel (1, 1, sum(C), F) + bias) to the nn.Conv it
    stands in for; subclassing keeps transplant tooling's isinstance
    checks working and the explicit name keeps checkpoint paths equal."""

    @nn.compact
    def __call__(self, xs):
        from vsr_tpu.ops.fused_squeeze import concat_matmul

        cin = sum(x.shape[-1] for x in xs)
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, cin, self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        from flax.linen import dtypes as _dtypes

        xs = tuple(xs)
        promoted = _dtypes.promote_dtype(*xs, kernel, bias, dtype=self.dtype)
        xs, kernel, bias = (tuple(promoted[:-2]), promoted[-2], promoted[-1])
        return concat_matmul(xs, kernel.reshape(cin, self.features), bias)


class _SubpixelConvTranspose(nn.ConvTranspose):
    """nn.ConvTranspose with the forward swapped for the exact sub-pixel
    decomposition (ops/subpixel.py): identical params (names, shapes,
    layout), identical math to float round-off. NB: measured SLOWER end to
    end (~0.87x, see ops/subpixel.py) — opt-in A/B path. Subclassing
    keeps ``isinstance(m, nn.ConvTranspose)`` true, so weight transplant
    and parity tooling see an ordinary deconv."""

    torch_padding: int = 0

    @nn.compact
    def __call__(self, x):
        from vsr_tpu.ops.subpixel import conv_transpose_subpixel

        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        from flax.linen import dtypes as _dtypes

        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        return conv_transpose_subpixel(x, kernel, bias, self.strides[0],
                                       self.torch_padding)


class ConvTranspose(nn.Module):
    """2D transposed conv matching torch.nn.ConvTranspose2d geometry.

    torch output size = (in-1)*stride - 2*padding + kernel. Implemented with
    flax ConvTranspose (padding as ((kernel-1-p, kernel-1-p),...) equivalent
    is handled by computing the XLA padding directly).

    ``subpixel=True`` computes the same map via one stride-1 phase conv +
    depth-to-space (ops/subpixel.py) — same params and results; measured
    ~0.87x end to end on TPU (recorded negative, see ops/subpixel.py);
    checkpoints are interchangeable.
    """

    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = None
    subpixel: bool = False

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        fan_in = k * k * x.shape[-1]
        # XLA conv_transpose padding that reproduces torch geometry:
        # pad = kernel - 1 - torch_padding on both sides.
        xla_pad = [(k - 1 - p, k - 1 - p)] * 2
        if self.subpixel:
            return _SubpixelConvTranspose(
                features=self.features,
                kernel_size=(k, k),
                strides=(s, s),
                padding=xla_pad,
                use_bias=self.use_bias,
                kernel_init=torch_kernel_init,
                bias_init=make_torch_bias_init(fan_in),
                dtype=self.dtype,
                torch_padding=p,
                name="ConvTranspose_0",  # checkpoint-path parity
            )(x)
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(k, k),
            strides=(s, s),
            padding=xla_pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class _ConvParams(nn.Module):
    """Declares the same (kernel, bias) leaves ``nn.Conv`` would — for
    paths that need the raw tensors (folded tails) while staying
    checkpoint-compatible with the plain conv (name it "Conv_0")."""

    kernel_shape: tuple
    fan_in: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kernel_init, self.kernel_shape)
        bias = (self.param("bias", make_torch_bias_init(self.fan_in),
                           (self.kernel_shape[-1],))
                if self.use_bias else None)
        return kernel, bias


class Conv3D(nn.Module):
    """3D conv, NDHWC, torch-default init, per-dim pixel padding."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = None
    #: See Conv.out_dtype (f32-accumulated output under bf16 compute).
    out_dtype: Any = None
    #: >0 (= the shuffle factor r): consume the PRE-shuffle array
    #: (``C*r^2`` channels) of a ``_pixel_shuffle_2d_in_3d(·, r)`` that
    #: would otherwise precede this conv, and compute the conv FOLDED
    #: through the shuffle (ops/fused_tail.py 3D variant) — the caller
    #: applies the shuffle to the ``features*r^2``-channel result. Same
    #: parameter leaves as the unfolded conv (checkpoints interchange).
    fold_shuffle2d: int = 0

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if self.fold_shuffle2d:
            import jax.numpy as jnp

            from vsr_tpu.ops.fused_tail import fuse_conv3d_through_shuffle2d

            if self.out_dtype is not None:
                raise NotImplementedError(
                    "fold_shuffle2d ignores out_dtype (the folded lax conv "
                    "has no accum-dtype hook here) — tails never use "
                    "carry_f32 accumulation, so reject the combination "
                    "loudly instead of silently dropping it")
            r = self.fold_shuffle2d
            if self.strides != (1, 1, 1) or not (k[1] % 2 and k[2] % 2):
                raise NotImplementedError(
                    "fold_shuffle2d supports stride-1, odd-H/W-kernel "
                    f"convs only (got strides={self.strides}, kernel={k})")
            if tuple(self.padding[1:]) != (k[1] // 2, k[2] // 2):
                # The fold derivation assumes SAME H/W padding; silently
                # substituting it for a declared valid/other padding
                # would change values AND shape.
                raise NotImplementedError(
                    f"fold_shuffle2d needs SAME H/W padding "
                    f"({k[1] // 2}, {k[2] // 2}); got {self.padding[1:]}")
            cin = x.shape[-1] // (r * r)
            fan_in = int(np.prod(k)) * cin
            kernel, bias = _ConvParams((*k, cin, self.features), fan_in,
                                       self.use_bias, name="Conv_0")()
            dtype = self.dtype or x.dtype
            K, B = fuse_conv3d_through_shuffle2d(
                kernel.astype(dtype),
                None if bias is None else bias.astype(dtype), r)
            pads = [(self.padding[0],) * 2,
                    (K.shape[1] // 2,) * 2, (K.shape[2] // 2,) * 2]
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), K, (1, 1, 1), pads,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y if B is None else y + B
        pad = [(p, p) for p in self.padding]
        fan_in = int(np.prod(k)) * x.shape[-1]
        conv_fn = (make_accum_conv(self.out_dtype)
                   if self.out_dtype is not None else None)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=self.strides,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            conv_general_dilated=conv_fn,
        )(x)


class FoldableConv(nn.Module):
    """SAME conv that can alternatively run FOLDED through the
    pixel_shuffle(factor) that would otherwise precede it.

    Unfolded: ``__call__(x)`` is a plain SAME conv on the post-shuffle array.
    Folded: ``__call__(pre, folded=True)`` consumes the PRE-shuffle array
    (``cin * factor^2`` channels) and returns the PRE-shuffle result
    (``features * factor^2`` channels) — so folded convs chain without ever
    materializing the full-resolution arrays; the caller applies ONE final
    pixel_shuffle. Elementwise activations commute with the shuffle, so they
    can be applied between folded convs directly. One parameter set serves
    both modes.
    """

    features: int
    kernel_size: int = 3
    factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, folded: bool = False):
        from vsr_tpu.ops.fused_tail import fuse_conv_through_shuffle

        k, r = self.kernel_size, self.factor
        if k % 2 == 0:
            # The fold derivation (and SAME-pad equality between modes)
            # assumes odd kernels; all SR tails use 3.
            raise ValueError(f"FoldableConv requires an odd kernel, got {k}")
        cin = x.shape[-1] // (r * r) if folded else x.shape[-1]
        fan_in = k * k * cin
        kernel = self.param("kernel", torch_kernel_init,
                            (k, k, cin, self.features))
        bias = self.param("bias", make_torch_bias_init(fan_in),
                          (self.features,))
        dtype = self.dtype or x.dtype
        if not folded:
            pad = k // 2
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), (1, 1),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(dtype)
        K, B = fuse_conv_through_shuffle(kernel.astype(dtype),
                                         bias.astype(dtype), r)
        pad = K.shape[0] // 2
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), K, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + B


class ShuffleConv(nn.Module):
    """``pixel_shuffle(factor)`` followed by a SAME conv — the sub-pixel tail
    of the SR nets — with an optional ``fused`` mode that folds the conv
    through the shuffle (ops/fused_tail.py) so the full-resolution
    intermediate never materializes (+8.6% EDSR serving on the chip,
    identical math up to float reassociation). Thin composition over
    :class:`FoldableConv` (one parameter set: train unfused, serve fused,
    same checkpoint).
    """

    features: int
    kernel_size: int = 3
    factor: int = 2
    fused: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, pre):
        """pre: (..., H, W, C*factor^2) -> (..., H*f, W*f, features)."""
        from vsr_tpu.ops.pixel_shuffle import pixel_shuffle

        conv = FoldableConv(self.features, self.kernel_size,
                            factor=self.factor, dtype=self.dtype)
        if self.fused:
            return pixel_shuffle(conv(pre, folded=True), self.factor)
        return conv(pixel_shuffle(pre, self.factor))


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def describe_params(params) -> str:
    n = count_params(params)
    return f"Trainable parameters: {n / 1e6} M\nMemory usage: {(n * 4) / (1 << 20)} MB"
