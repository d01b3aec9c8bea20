"""Generic flax -> torch weight transplant by execution order.

Both frameworks are walked in true *execution order* of their primitive
parameterized modules — flax via ``nn.intercept_methods`` (module call
interception during ``apply``), torch via ``register_forward_pre_hook`` —
with repeated calls of the same module deduplicated. Because every net in
the zoo applies its layers in the same dataflow order as the reference, the
two sequences must align one-to-one in (kind, shape); every position is
asserted, so a misalignment fails loudly instead of producing a silent
garbage comparison.

Layout transforms per kind:

- conv: flax (*window, Cin, Cout) -> torch (Cout, Cin, *window)
- deconv: flax (kh, kw, Cin, Cout) -> torch (Cin, Cout, kh, kw) with both
  spatial dims flipped (flax ConvTranspose correlates, torch convolves)
- prelu: alpha (1,) -> torch .weight
- bn: scale/bias -> weight/bias, batch_stats mean/var -> running stats
- mdcn/dcn packs: main weight like conv; the offset/mask-predicting conv's
  output channels are permuted — the CUDA kernel reads per-deformable-group
  *interleaved* (dy, dx) channels (``deform_conv_cuda_kernel.cu:607-611``)
  while vsr_tpu's pack unpacks ``(chunk, dg, k2)`` blocks
  (``vsr_tpu/models/edvr.py:88-91``). The two are equivalent up to this
  fixed channel permutation of the zero-initialized offset conv, which the
  transplant applies explicitly.
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn

_FLAX_PACKS = ("ModulatedDeformConvPack", "DeformConvPack")


def flax_leaf_order(net, variables, *args, **kwargs):
    """Run ``net.apply(variables, *args)`` recording (kind, path) of each
    parameterized primitive in execution order (deduplicated)."""
    entries = []
    seen = set()
    pack_paths = []

    def interceptor(next_fn, a, kw, context):
        m = context.module
        if context.method_name == "__call__":
            path = m.path
            kind = None
            if type(m).__name__ in _FLAX_PACKS:
                kind = "mdcn" if type(m).__name__.startswith("Modulated") else "dcn"
            elif type(m).__name__ == "FoldableConv":
                # Shuffle-adjacent conv owning kernel/bias directly —
                # transplants exactly like a conv (same HWIO layout).
                # (ShuffleConv is a pure wrapper around it.)
                kind = "conv"
            elif isinstance(m, nn.ConvTranspose):
                kind = "deconv"
            elif isinstance(m, nn.Conv):
                kind = "conv"
            elif isinstance(m, nn.BatchNorm):
                kind = "bn"
            elif type(m).__name__ in ("PReLU", "_PReLU"):
                kind = "prelu"
            if kind is not None and path not in seen:
                under_pack = any(
                    path[: len(p)] == p and len(path) > len(p)
                    for p in pack_paths
                )
                if not under_pack:
                    seen.add(path)
                    entries.append((kind, path))
                    if kind in ("mdcn", "dcn"):
                        pack_paths.append(path)
        return next_fn(*a, **kw)

    with nn.intercept_methods(interceptor):
        net.apply(variables, *args, **kwargs)
    return entries


def torch_leaf_order(tnet, run_fn):
    """Record (kind, module) of torch primitives in execution order.

    ``run_fn(tnet)`` must perform one forward pass.
    """
    import torch

    kinds = {
        "Conv2d": "conv", "Conv3d": "conv", "ConvTranspose2d": "deconv",
        "PReLU": "prelu", "BatchNorm2d": "bn", "BatchNorm3d": "bn",
        "ModulatedDeformConvPack": "mdcn", "DeformConvPack": "dcn",
    }
    skip_ids = set()
    for m in tnet.modules():
        if type(m).__name__ in ("ModulatedDeformConvPack", "DeformConvPack"):
            inner = getattr(m, "conv_offset_mask", None) or getattr(m, "conv_offset", None)
            if inner is not None:
                skip_ids.add(id(inner))

    entries = []
    seen = set()
    handles = []

    def make_hook(kind):
        def hook(module, args):
            if id(module) not in seen and id(module) not in skip_ids:
                seen.add(id(module))
                entries.append((kind, module))
        return hook

    for m in tnet.modules():
        kind = kinds.get(type(m).__name__)
        if kind is not None:
            handles.append(m.register_forward_pre_hook(make_hook(kind)))
    try:
        with torch.no_grad():
            run_fn(tnet)
    finally:
        for h in handles:
            h.remove()
    return entries


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _to_t(a):
    import torch

    return torch.from_numpy(np.asarray(a, dtype=np.float32).copy())


def _copy_conv(sub, tmod):
    import torch

    kernel = np.asarray(sub["kernel"])
    nd = kernel.ndim  # (*window, Cin, Cout)
    axes = (nd - 1, nd - 2) + tuple(range(nd - 2))
    with torch.no_grad():
        w = _to_t(kernel.transpose(axes))
        assert w.shape == tmod.weight.shape, (w.shape, tmod.weight.shape)
        tmod.weight.copy_(w)
        if sub.get("bias") is not None and tmod.bias is not None:
            tmod.bias.copy_(_to_t(sub["bias"]))


def _copy_deconv(sub, tmod):
    import torch

    kernel = np.asarray(sub["kernel"])  # (kh, kw, Cin, Cout)
    with torch.no_grad():
        w = _to_t(kernel.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])
        assert w.shape == tmod.weight.shape, (w.shape, tmod.weight.shape)
        tmod.weight.copy_(w)
        if "bias" in sub and tmod.bias is not None:
            tmod.bias.copy_(_to_t(sub["bias"]))


def dcn_offset_perm(dg: int, k2: int, with_mask: bool) -> np.ndarray:
    """perm[torch_channel] = flax_channel for the pack's offset(+mask) conv."""
    n = (3 if with_mask else 2) * dg * k2
    perm = np.zeros(n, dtype=np.int64)
    for g in range(dg):
        for m in range(k2):
            perm[g * 2 * k2 + 2 * m] = g * k2 + m            # dy
            perm[g * 2 * k2 + 2 * m + 1] = dg * k2 + g * k2 + m  # dx
    if with_mask:
        base = 2 * dg * k2
        perm[base:] = np.arange(base, 3 * dg * k2)
    return perm


def _copy_pack(sub, tmod, with_mask):
    import torch

    _copy_conv({"kernel": sub["weight"], "bias": sub.get("bias")}, _PackMain(tmod))
    inner = getattr(tmod, "conv_offset_mask", None) or getattr(tmod, "conv_offset")
    off = sub["Conv_0"]
    kernel = np.asarray(off["kernel"])  # (k, k, Cin, 3*dg*k2)
    bias = np.asarray(off["bias"])
    k2 = tmod.kernel_size[0] * tmod.kernel_size[1]
    perm = dcn_offset_perm(tmod.deformable_groups, k2, with_mask)
    with torch.no_grad():
        w = _to_t(kernel[..., perm].transpose(3, 2, 0, 1))
        assert w.shape == inner.weight.shape, (w.shape, inner.weight.shape)
        inner.weight.copy_(w)
        inner.bias.copy_(_to_t(bias[perm]))


class _PackMain:
    """Adapter exposing a pack's main weight/bias as a conv-like module."""

    def __init__(self, pack):
        self.weight = pack.weight
        self.bias = pack.bias


def _copy_bn(psub, ssub, tmod):
    import torch

    with torch.no_grad():
        tmod.weight.copy_(_to_t(psub["scale"]))
        tmod.bias.copy_(_to_t(psub["bias"]))
        tmod.running_mean.copy_(_to_t(ssub["mean"]))
        tmod.running_var.copy_(_to_t(ssub["var"]))


def _copy_prelu(sub, tmod):
    import torch

    with torch.no_grad():
        tmod.weight.copy_(_to_t(sub["alpha"]))


def transplant(variables, flax_entries, torch_entries):
    """Copy flax params into the torch net, asserting 1:1 alignment."""
    fk = [k for k, _ in flax_entries]
    tk = [k for k, _ in torch_entries]
    assert fk == tk, (
        "execution-order mismatch:\n flax: %s\n torch: %s"
        % (list(zip(fk, [p for _, p in flax_entries])),
           [(k, type(m).__name__) for k, m in torch_entries])
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for (kind, path), (_, tmod) in zip(flax_entries, torch_entries):
        sub = _get(params, path)
        if kind == "conv":
            _copy_conv(sub, tmod)
        elif kind == "deconv":
            _copy_deconv(sub, tmod)
        elif kind == "prelu":
            _copy_prelu(sub, tmod)
        elif kind == "bn":
            _copy_bn(sub, _get(stats, path), tmod)
        elif kind == "mdcn":
            _copy_pack(sub, tmod, with_mask=True)
        elif kind == "dcn":
            _copy_pack(sub, tmod, with_mask=False)
        else:  # pragma: no cover
            raise AssertionError(kind)


def perturb_variables(variables, rng: np.random.Generator, scale: float = 0.02):
    # 0.02 keeps deep activations in a regime where both frameworks agree to
    # <=5e-7 fp32 (larger noise only adds float round-off amplification in
    # the warp/BN-heavy nets) while still making zero-init layers active
    # enough that layout errors exceed the 5e-6 test tolerance by >3x.
    """Add noise to every param so zero-initialized layers (DCN offset convs,
    resblock biases) contribute to the forward pass; keep BN variances
    positive."""
    import jax

    def leaf(path, a):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        a = np.asarray(a)
        if name == "var":
            return a * np.exp(rng.normal(0.0, scale, a.shape)).astype(a.dtype)
        return a + rng.normal(0.0, scale, a.shape).astype(a.dtype)

    return jax.tree_util.tree_map_with_path(leaf, variables)
