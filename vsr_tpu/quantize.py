"""int8 weight quantization for the serving path.

Kernels are quantized to int8 with per-output-channel symmetric scales
(kernel leaves: flax ``kernel`` / DCN ``weight``; biases, norm parameters and
PReLU alphas stay fp32 — they are tiny and precision-critical). At inference
the int8 weights live in HBM (4x smaller than fp32, 2x smaller than bf16)
and are dequantized inside the jitted program right before each conv, so the
weight traffic from HBM is int8 while the MXU computes in ``compute_dtype``
(bf16 by default).

This has no reference counterpart (the reference serves fp32 torch); it is
the TPU-native serving lever from the round-1 plan. Accuracy is gated in
tests: SR PSNR delta vs the unquantized net < 0.05 dB.

Usage:
    qparams, scales = quantize_params(params)
    apply_fn = make_quantized_apply(net, qparams, scales)
    sr = jax.jit(apply_fn)(x)

or end-to-end via ``python -m vsr_tpu.infer ... --int8``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_KERNEL_NAMES = ("kernel", "weight")


def _is_kernel(path, leaf) -> bool:
    name = str(path[-1].key) if hasattr(path[-1], "key") else ""
    return name in _KERNEL_NAMES and np.ndim(leaf) >= 2


def quantize_params(params) -> tuple[Any, Any]:
    """Split a params tree into (qparams, scales).

    Kernel leaves become int8 with a broadcastable per-output-channel scale
    (last axis); all other leaves pass through with a scalar 1.0 scale so the
    two trees share the params structure exactly. One traversal computes
    both trees, so the scale formula cannot desynchronize.
    """

    def leaf(path, value):
        value = np.asarray(value)
        if not _is_kernel(path, value):
            return value, np.float32(1.0)
        amax = np.max(np.abs(value), axis=tuple(range(value.ndim - 1)),
                      keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(value / scale), -127, 127).astype(np.int8)
        return q, scale

    pairs = jax.tree_util.tree_map_with_path(leaf, params)
    # Params trees contain no tuples, so every tuple is one of our pairs.
    is_pair = lambda x: isinstance(x, tuple)
    qparams = jax.tree_util.tree_map(lambda p: p[0], pairs, is_leaf=is_pair)
    scales = jax.tree_util.tree_map(lambda p: p[1], pairs, is_leaf=is_pair)
    return qparams, scales


def dequantize_params(qparams, scales, dtype=jnp.float32):
    """Rebuild a dense params tree (inside jit: int8 weights stay in HBM and
    the dequant multiply fuses into the consumer)."""

    def leaf(q, s):
        if q.dtype == jnp.int8:
            return (q.astype(dtype) * jnp.asarray(s, dtype)).astype(dtype)
        return q

    return jax.tree_util.tree_map(leaf, qparams, scales)


def make_quantized_apply(net, qparams, scales, compute_dtype=jnp.float32,
                         **apply_kwargs):
    """Returns ``apply(x)`` closing over the int8 tree; jit it once.

    Dequantization runs in ``compute_dtype`` (fp32 default — pass bf16 for
    bf16 serving). The trees are device_put first: raw numpy closures would
    lower to literal constants that XLA's constant folding could expand back
    into dense full-precision weights, silently defeating int8 residency;
    device buffers are delivered as executable parameters and cannot fold.
    """
    qparams = jax.tree_util.tree_map(jnp.asarray, qparams)
    scales = jax.tree_util.tree_map(jnp.asarray, scales)

    def apply(x, **kw):
        params = dequantize_params(qparams, scales, compute_dtype)
        return net.apply(params, x, **apply_kwargs, **kw)

    return apply


def kernel_shapes(params) -> dict:
    """``{module_path: kernel_shape}`` for every kernel leaf.

    The key space matches the ``act_scales`` dicts from
    :func:`calibrate_w8a8` (flax module paths joined by ``/``), so a cached
    calibration can be filtered by conv geometry — e.g. keep only 3x3 convs
    — without re-calibrating: the selective-W8A8 A/B workflow.
    """
    out: dict = {}

    def walk(node, path):
        for k, v in node.items():
            if k in _KERNEL_NAMES and hasattr(v, "shape"):
                out["/".join(path)] = tuple(v.shape)
            elif hasattr(v, "items"):
                walk(v, path + [k])

    tree = params["params"] if "params" in params else params
    walk(tree, [])
    return out


def quantized_nbytes(qparams) -> int:
    return sum(np.asarray(l).nbytes for l in jax.tree_util.tree_leaves(qparams))


def filter_scales_by_kernel(params, act_scales: dict, sizes) -> dict:
    """Keep only the activation scales of convs whose spatial kernel size is
    in ``sizes`` (e.g. ``{6}`` = the k6s2 projections, ``{3, 6}`` = all but
    the 1x1 squeezes). Pruned convs serve full precision (uncalibrated-conv
    fallback in :func:`make_w8a8_apply`).

    This is the selective-W8A8 knob the DBPN-ladder nets need: full W8A8
    REGRESSES there (0.91x — quantizing the bandwidth-bound 1x1 squeezes
    breaks the concat fusions their serving time depends on) while k6-only
    measures 1.08x on SRFBN/DRFSISR (scripts/probe_w8a8_selective.py, on
    chip). Exposed as ``--w8a8-kernels`` in ``vsr_tpu.infer`` / ``export``.
    """
    sizes = set(int(s) for s in sizes)
    shapes = kernel_shapes(params)
    return {path: s for path, s in act_scales.items()
            if path in shapes and int(shapes[path][0]) in sizes}


# ---------------------------------------------------------------------------
# W8A8: run the convs themselves on the double-rate int8 MXU.
#
# The v5e MXU multiplies int8 at 2x the bf16 rate, and the zoo's 64-channel
# conv component measures the full 1.97x (scripts/probe_int8_conv.py, round
# 3) — the bf16 ceiling at this class is bandwidth-bound and int8 halves the
# bytes. Weight-only int8 (above) never touches the MXU dtype; this path
# quantizes the ACTIVATIONS too and issues s8 x s8 -> s32 convolutions.
#
# Design (TPU-first):
#   - flax method interception swaps eligible ``nn.Conv.__call__``s for the
#     quantized computation — zero model-code changes, any net in the zoo.
#   - eligibility: exact-type nn.Conv with min(C_in, C_out) >= min_channels.
#     The quality-critical image head/tail convs are naturally narrow
#     (C=1..4) and stay full precision — which is also exactly the class
#     where int8 cannot win (the MXU is idle on narrow channels anyway).
#   - weights: per-output-channel symmetric scales, quantized INLINE in the
#     traced program from the dense params (kernels are KB-sized; the
#     runtime cost is noise and there is a single source of truth).
#   - activations: per-tensor symmetric scales. ``act_scales="dynamic"``
#     computes max|x|/127 inline (works for any net, incl. scan bodies);
#     a dict from :func:`calibrate_w8a8` bakes STATIC scales, which XLA can
#     fuse into the producing epilogue (no extra reduction pass — the
#     faster serving configuration).
#   - accumulation in int32 (``preferred_element_type``), dequant + bias in
#     f32, cast back to the dtype the bf16 pipeline expects.
#
# No reference counterpart (the reference serves fp32 torch); this is the
# round-3 TPU serving lever. Accuracy is gated in tests/test_quantize.py.
# ---------------------------------------------------------------------------

_CONV_DIM_NUMBERS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _tuple_of(v, rank: int, default: int = 1) -> tuple:
    if v is None:
        return (default,) * rank
    if isinstance(v, int):
        return (v,) * rank
    return tuple(v)


def _canonical_padding(padding, rank: int):
    """flax nn.Conv padding -> lax.conv_general_dilated padding (or a str
    sentinel for the modes we fall back to full precision on)."""
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding)] * rank
    out = []
    for e in padding:
        out.append((e, e) if isinstance(e, int) else tuple(e))
    if len(out) == 1 and rank > 1:
        out = out * rank
    return out


def _conv_eligible(mod, method_name: str, args, min_channels: int,
                   conv_filter=None, quantize_deconvs: bool = False) -> bool:
    import flax.linen as nn

    is_conv = type(mod) is nn.Conv
    # Exact type: excludes _SubpixelConvTranspose (own forward, intercepting
    # the wrapper would double-apply) and any masked/causal subclass.
    # Deconvs are OFF by default: scripts/probe_int8_deconv.py measured the
    # int8 lax.conv_transpose lowering at 1.03x bf16 (the double-rate MXU
    # path is not reached for lhs-dilated convs) — quantizing them adds
    # q/dq fusion breaks for ~no MXU win.
    is_deconv = quantize_deconvs and type(mod) is nn.ConvTranspose
    if not (is_conv or is_deconv) or method_name != "__call__":
        return False
    if not args or not hasattr(args[0], "shape"):
        return False
    x = args[0]
    # The zoo always builds nn.Conv with a kernel_size tuple (models/common
    # Conv/Conv3D); an int (flax 1D shorthand) stays full precision.
    rank = len(mod.kernel_size) if isinstance(mod.kernel_size, (tuple, list)) else 0
    if rank not in _CONV_DIM_NUMBERS:
        return False
    if x.ndim < rank + 1 or not jnp.issubdtype(x.dtype, jnp.floating):
        return False
    if getattr(mod, "mask", None) is not None:
        return False
    if is_deconv and getattr(mod, "transpose_kernel", False):
        return False  # kernel laid out (out, in): keep full precision
    pad = _canonical_padding(mod.padding, rank)
    if isinstance(pad, str) and pad not in ("SAME", "VALID"):
        return False  # CIRCULAR / CAUSAL: let flax handle it in full precision
    if min(int(x.shape[-1]), int(mod.features)) < min_channels:
        return False
    if conv_filter is not None and not conv_filter(mod):
        return False
    return True


def _dispatch_conv(mod, x, kernel, rank, kernel_shape, *,
                   preferred_element_type):
    """The lax convolution an eligible flax Conv/ConvTranspose lowers to,
    shared by the integer (:func:`_w8a8_conv`) and fake-quant
    (:func:`_fake_quant_conv`) paths so both run the identical geometry."""
    import flax.linen as nn

    if type(mod) is nn.ConvTranspose:
        return jax.lax.conv_transpose(
            x, kernel,
            strides=_tuple_of(mod.strides, rank),
            padding=_canonical_padding(mod.padding, rank),
            rhs_dilation=_tuple_of(mod.kernel_dilation, rank),
            dimension_numbers=_CONV_DIM_NUMBERS[rank],
            transpose_kernel=False,
            preferred_element_type=preferred_element_type,
        )
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_shape, _CONV_DIM_NUMBERS[rank])
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=_tuple_of(mod.strides, rank),
        padding=_canonical_padding(mod.padding, rank),
        lhs_dilation=_tuple_of(mod.input_dilation, rank),
        rhs_dilation=_tuple_of(mod.kernel_dilation, rank),
        dimension_numbers=dn,
        feature_group_count=mod.feature_group_count,
        preferred_element_type=preferred_element_type,
    )


def _w8a8_conv(mod, x, act_scale):
    """The intercepted body: s8 x s8 -> s32 (de)conv + f32 dequant/bias.

    Handles both nn.Conv (conv_general_dilated) and nn.ConvTranspose
    (lax.conv_transpose, transpose_kernel=False — kernel (*window, in, out)
    like the forward conv, so the per-output-channel scale code is shared).
    """
    import flax.linen as nn
    from flax.linen import dtypes as _dtypes

    rank = len(mod.kernel_size)
    variables = mod.variables["params"]
    kernel = variables["kernel"]
    bias = variables.get("bias") if mod.use_bias else None
    out_dtype = _dtypes.canonicalize_dtype(x, kernel, bias, dtype=mod.dtype)

    # Mirror flax's batch-dim handling: add a batch dim for unbatched input,
    # flatten extra leading dims into one.
    orig_shape = x.shape
    if x.ndim == rank + 1:
        x = x[None]
    elif x.ndim > rank + 2:
        x = x.reshape((-1,) + x.shape[-(rank + 1):])

    # Per-tensor activation scale: static (baked) or dynamic (inline max).
    if act_scale is None:
        amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
        xs = jnp.maximum(amax, 1e-8) / 127.0
    else:
        xs = jnp.float32(act_scale)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127)
    xq = xq.astype(jnp.int8)

    # Per-output-channel weight scales, quantized inline (kernels are tiny;
    # XLA hoists the constant-shaped arithmetic off the activation path).
    kf = kernel.astype(jnp.float32)
    amax_w = jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)), keepdims=True)
    ws = jnp.where(amax_w > 0, amax_w / 127.0, 1.0)
    wq = jnp.clip(jnp.round(kf / ws), -127, 127).astype(jnp.int8)

    out = _dispatch_conv(mod, xq, wq, rank, kernel.shape,
                         preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * (ws.reshape((1,) * (rank + 1) + (-1,)) * xs)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = out.astype(out_dtype)
    if len(orig_shape) == rank + 1:
        out = out[0]
    elif len(orig_shape) > rank + 2:
        out = out.reshape(orig_shape[:-(rank + 1)] + out.shape[-(rank + 1):])
    return out


def make_w8a8_apply(net, params, act_scales="dynamic", min_channels=16,
                    conv_filter=None, quantize_deconvs=False,
                    **apply_kwargs):
    """Returns ``apply(x)`` serving eligible convs as int8 x int8 -> int32.

    ``act_scales``: ``"dynamic"`` (per-call max|x| scales — universal) or a
    ``{module_path: scale}`` dict from :func:`calibrate_w8a8` (static scales
    that fuse into the producer — faster; uncalibrated convs fall back to
    full precision). Params stay the dense tree — combine with the
    weight-only path via ``dequantize_params`` upstream if int8 HBM
    residency is also wanted.

    ``conv_filter``: optional ``(module) -> bool`` predicate restricting
    quantization to a subset of the eligible convs (e.g. by kernel size or
    module path) — the selective-W8A8 A/B knob. ``quantize_deconvs=True``
    additionally intercepts nn.ConvTranspose (measured ~1.03x at the k6s2
    component — scripts/probe_int8_deconv.py — so default off).
    """
    import flax.linen as nn

    static = None if act_scales == "dynamic" else dict(act_scales)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not _conv_eligible(mod, context.method_name, args, min_channels,
                              conv_filter, quantize_deconvs):
            return next_fun(*args, **kwargs)
        if static is None:
            scale = None
        else:
            scale = static.get("/".join(mod.path))
            if scale is None:  # uncalibrated (e.g. new branch): stay exact
                return next_fun(*args, **kwargs)
        return _w8a8_conv(mod, args[0], scale)

    def apply(x, **kw):
        with nn.intercept_methods(interceptor):
            return net.apply(params, x, **apply_kwargs, **kw)

    return apply


def calibrate_w8a8(net, params, sample_inputs, min_channels=16,
                   method: str = "outputs", conv_filter=None,
                   quantize_deconvs: bool = False, **apply_kwargs):
    """Run calibration forwards and return static per-conv activation scales
    ``{module_path: float}`` (symmetric abs-max / 127) for
    :func:`make_w8a8_apply`.

    ``method="outputs"`` (default): one jitted dispatch + one readback per
    sample — the stats dict is the jit output (no per-conv readbacks through
    the axon relay). Convs inside ``lax.scan``/``nn.scan`` bodies cannot
    export their abs-max from the traced body; they are simply absent from
    the dict and serve full precision.

    ``method="callback"``: records abs-max via ``jax.debug.callback``, which
    DOES fire inside scan bodies (once per executed iteration; merged by
    max) — calibrates the recurrent nets' step convs too. Every conv site
    pays a device->host scalar callback, so run this on the CPU backend
    (scales are backend-independent), not through the axon relay.
    """
    import flax.linen as nn

    if method == "callback":
        host: dict[str, float] = {}

        def record(path, a):
            host[path] = max(host.get(path, 0.0), float(a))

        def run_cb(x):
            def interceptor(next_fun, args, kwargs, context):
                mod = context.module
                if _conv_eligible(mod, context.method_name, args,
                                  min_channels, conv_filter,
                                  quantize_deconvs):
                    path = "/".join(mod.path)
                    amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                    jax.debug.callback(
                        lambda a, path=path: record(path, a), amax)
                return next_fun(*args, **kwargs)

            with nn.intercept_methods(interceptor):
                net.apply(params, x, **apply_kwargs)
            return 0

        jitted_cb = jax.jit(run_cb)
        for x in sample_inputs:
            jax.block_until_ready(jitted_cb(jnp.asarray(x)))
        jax.effects_barrier()
        return {k: max(v, 1e-8) / 127.0 for k, v in host.items()}

    def run(x):
        stats = {}

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if _conv_eligible(mod, context.method_name, args, min_channels,
                              conv_filter, quantize_deconvs):
                path = "/".join(mod.path)
                amax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                prev = stats.get(path)
                if prev is not None:
                    # nn.scan traces its body more than once; a prev stat
                    # from a closed body trace raises on use — start fresh.
                    try:
                        amax = jnp.maximum(prev, amax)
                    except Exception:
                        pass
                stats[path] = amax
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            net.apply(params, x, **apply_kwargs)

        # A stat recorded inside a scan body belongs to the (now closed)
        # body trace and would leak if returned — keep only stats created
        # at THIS jit trace level (inner-scan convs serve full precision;
        # use method="callback" to calibrate them too).
        outer = jnp.max(x.astype(jnp.float32)) * 0  # outer-trace probe
        outer_trace = getattr(outer, "_trace", None)
        return {k: v for k, v in stats.items()
                if getattr(v, "_trace", None) is outer_trace}

    merged: dict[str, float] = {}
    jitted = jax.jit(run)
    for x in sample_inputs:
        stats = jax.device_get(jitted(jnp.asarray(x)))
        for k, v in stats.items():
            merged[k] = max(merged.get(k, 0.0), float(v))
    return {k: max(v, 1e-8) / 127.0 for k, v in merged.items()}


# ---------------------------------------------------------------------------
# Quantization-aware training (QAT): the differentiable twin of the W8A8
# serving path. Fine-tuning through the fake-quantized forward lets the
# weights absorb the quantization error the post-training calibration leaves
# behind, closing the W8A8 PSNR gap before export. No reference counterpart
# (the reference trains/serves fp32 torch); this backs the int8 serving
# configuration that is this framework's throughput headline.
#
# Design: the SAME eligibility predicate, the SAME scale math (per-tensor
# static/dynamic activation scales, per-output-channel symmetric weight
# scales computed inline from the live params) and the SAME conv geometry
# (_dispatch_conv) as _w8a8_conv — but computed in f32 on fake-quantized
# operands, with straight-through-estimator gradients (round passes gradient
# 1, clip masks it). The forward therefore matches the deployed s8xs8->s32
# integer path to f32 rounding, and what the optimizer sees during QAT is
# what serving runs. Scales themselves take no gradient (min-max QAT).
# ---------------------------------------------------------------------------


def fake_quant(x, scale, qmax: float = 127.0):
    """``round(clip(x/s, ±qmax)) * s`` with straight-through gradients:
    d/dx = 1 where ``|x/s| <= qmax`` and 0 where clipped (jnp.clip's own
    subgradient supplies the mask; stop_gradient erases round's)."""
    xs = x / scale
    clipped = jnp.clip(xs, -qmax, qmax)
    rounded = jnp.round(clipped)
    return scale * (clipped + jax.lax.stop_gradient(rounded - clipped))


def _fake_quant_conv(mod, x, act_scale):
    """Differentiable twin of :func:`_w8a8_conv`: identical scale math and
    conv geometry, f32 compute over fake-quantized operands, STE grads."""
    from flax.linen import dtypes as _dtypes

    rank = len(mod.kernel_size)
    variables = mod.variables["params"]
    kernel = variables["kernel"]
    bias = variables.get("bias") if mod.use_bias else None
    out_dtype = _dtypes.canonicalize_dtype(x, kernel, bias, dtype=mod.dtype)

    orig_shape = x.shape
    if x.ndim == rank + 1:
        x = x[None]
    elif x.ndim > rank + 2:
        x = x.reshape((-1,) + x.shape[-(rank + 1):])

    x = x.astype(jnp.float32)
    if act_scale is None:
        amax = jax.lax.stop_gradient(jnp.max(jnp.abs(x)))
        xs = jnp.maximum(amax, 1e-8) / 127.0
    else:
        xs = jnp.float32(act_scale)
    xfq = fake_quant(x, xs)

    kf = kernel.astype(jnp.float32)
    amax_w = jax.lax.stop_gradient(
        jnp.max(jnp.abs(kf), axis=tuple(range(kf.ndim - 1)), keepdims=True))
    ws = jnp.where(amax_w > 0, amax_w / 127.0, 1.0)
    wfq = fake_quant(kf, ws)

    out = _dispatch_conv(mod, xfq, wfq, rank, kernel.shape,
                         preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = out.astype(out_dtype)
    if len(orig_shape) == rank + 1:
        out = out[0]
    elif len(orig_shape) > rank + 2:
        out = out.reshape(orig_shape[:-(rank + 1)] + out.shape[-(rank + 1):])
    return out


def kernel_size_filter(sizes):
    """``conv_filter`` keeping only convs whose spatial kernel size is in
    ``sizes`` — the interceptor-side twin of :func:`filter_scales_by_kernel`
    (which needs a calibration dict; this one also covers dynamic scales),
    so ``qat.kernels`` and ``--w8a8-kernels`` select the same conv set."""
    sizes = set(int(s) for s in sizes)

    def conv_filter(mod):
        return int(mod.kernel_size[0]) in sizes

    return conv_filter


def make_qat_interceptor(act_scales="dynamic", min_channels=16,
                         conv_filter=None, quantize_deconvs=False):
    """flax method interceptor swapping eligible convs for the fake-quant
    computation. Wrap any ``net.apply`` (trainer steps included — it is a
    trace-time mechanism, so it composes with jit/grad/scan):

        with nn.intercept_methods(make_qat_interceptor(scales)):
            out = net.apply(params, x)

    ``act_scales``/eligibility knobs exactly as :func:`make_w8a8_apply`;
    uncalibrated convs under static scales run full precision, matching the
    serving fallback.
    """
    static = None if act_scales == "dynamic" else dict(act_scales)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not _conv_eligible(mod, context.method_name, args, min_channels,
                              conv_filter, quantize_deconvs):
            return next_fun(*args, **kwargs)
        if static is None:
            scale = None
        else:
            scale = static.get("/".join(mod.path))
            if scale is None:
                return next_fun(*args, **kwargs)
        return _fake_quant_conv(mod, args[0], scale)

    return interceptor


def make_fake_quant_apply(net, params, act_scales="dynamic", min_channels=16,
                          conv_filter=None, quantize_deconvs=False,
                          **apply_kwargs):
    """``apply(x)`` running the fake-quant forward — the differentiable
    stand-in for :func:`make_w8a8_apply` (standalone QAT loops and the
    forward-agreement tests use it; trainers use the interceptor)."""
    import flax.linen as nn

    interceptor = make_qat_interceptor(act_scales, min_channels, conv_filter,
                                       quantize_deconvs)

    def apply(x, **kw):
        with nn.intercept_methods(interceptor):
            return net.apply(params, x, **apply_kwargs, **kw)

    return apply


def resolve_qat(qat):
    """Normalize a trainer/CLI ``qat`` option into an interceptor.

    ``qat`` may be ``True`` (dynamic scales, defaults) or a dict with keys
    ``act_scales`` (``"dynamic"`` | ``{path: scale}`` | path to a JSON file
    from ``scripts``' calibration dumps), ``min_channels``, ``kernels``
    (spatial sizes, as ``--w8a8-kernels``) and ``quantize_deconvs``.
    Unknown keys raise — a typo must not silently train un-quantized.
    """
    qat = {} if qat is True else dict(qat)
    scales = qat.pop("act_scales", "dynamic")
    if isinstance(scales, str) and scales != "dynamic":
        import json
        from pathlib import Path

        scales = {k: float(v)
                  for k, v in json.loads(Path(scales).read_text()).items()}
    kernels = qat.pop("kernels", None)
    interceptor = make_qat_interceptor(
        act_scales=scales,
        min_channels=int(qat.pop("min_channels", 16)),
        conv_filter=kernel_size_filter(kernels) if kernels else None,
        quantize_deconvs=bool(qat.pop("quantize_deconvs", False)),
    )
    if qat:
        raise ValueError(f"unknown qat option(s): {sorted(qat)} — valid "
                         "keys: act_scales, min_channels, kernels, "
                         "quantize_deconvs")
    return interceptor
