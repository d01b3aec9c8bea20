"""Weight interop with the reference torch framework.

Bidirectional weight transfer between vsr_tpu flax variables and the
reference's torch modules (``/root/reference/src/model/nets/*.py``), keyed
by *execution order* of the parameterized primitives on both sides:

- flax side via ``nn.intercept_methods`` (module-call interception during
  ``apply``) — NOT construction-order name suffixes, which differ from
  dataflow order in several nets (e.g. RBPN's shared PReLU);
- torch side via ``register_forward_pre_hook`` over one forward pass.

Repeated calls of the same module are deduplicated; the two sequences are
asserted to align 1:1 in kind, so a misalignment fails loudly instead of
producing silent garbage.

Directions:

- ``transplant(variables, flax_entries, torch_entries)`` copies flax ->
  torch in place (drives the parity tests in tests/test_ref_parity.py);
- ``import_torch_state(variables, flax_entries, torch_entries)`` returns a
  new variables dict with the torch net's weights — the engine behind the
  ``vsr_tpu.convert`` checkpoint importer.

Layout transforms per kind (torch <-> flax):

- conv: torch (Cout, Cin, *window) <-> flax (*window, Cin, Cout)
- deconv: torch (Cin, Cout, kh, kw) with both spatial dims flipped <->
  flax (kh, kw, Cin, Cout) (flax ConvTranspose correlates, torch convolves)
- prelu: torch .weight <-> alpha
- bn: weight/bias/running stats <-> scale/bias + batch_stats mean/var
- mdcn/dcn packs: main weight like conv; the offset/mask-predicting conv's
  output channels are permuted — the CUDA kernel reads per-deformable-group
  *interleaved* (dy, dx) channels (``deform_conv_cuda_kernel.cu:607-611``)
  while vsr_tpu's pack unpacks ``(chunk, dg, k2)`` blocks
  (``vsr_tpu/models/edvr.py:88-91``); ``dcn_offset_perm`` maps between the
  two, applied forward on export and inverted on import.
"""

from __future__ import annotations

import numpy as np
from flax import linen as nn

_FLAX_PACKS = ("ModulatedDeformConvPack", "DeformConvPack")


# --------------------------------------------------------- order capture


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


def _assert_aligned(flax_entries, torch_entries):
    fk = [k for k, _ in flax_entries]
    tk = [k for k, _ in torch_entries]
    assert fk == tk, (
        "execution-order mismatch:\n flax: %s\n torch: %s"
        % (list(zip(fk, [p for _, p in flax_entries])),
           [(k, type(m).__name__) for k, m in torch_entries])
    )


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


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


# --------------------------------------------------- export (flax -> torch)


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
    _assert_aligned(flax_entries, torch_entries)
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


# --------------------------------------------------- import (torch -> flax)


def _np(t):
    return t.detach().cpu().numpy()


def _like(template, value: np.ndarray) -> np.ndarray:
    template = np.asarray(template)
    assert value.shape == template.shape, (value.shape, template.shape)
    return np.ascontiguousarray(value).astype(template.dtype)


def _ident(a):
    return a


def _conv_t(w):
    nd = w.ndim  # (Cout, Cin, *window) -> (*window, Cin, Cout)
    return w.transpose(tuple(range(2, nd)) + (1, 0))


def _deconv_t(w):
    # (Cin, Cout, kh, kw) spatial-flipped vs flax -> (kh, kw, Cin, Cout)
    return w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)


def _pack_main_t(w):
    return w.transpose(2, 3, 1, 0)  # (Cout, Cin, k, k) -> (k, k, Cin, Cout)


def _offset_w_t(perm):
    def t(w):
        hwio = w.transpose(2, 3, 1, 0)  # (k, k, Cin, Cout_torch)
        kernel = np.empty_like(hwio)
        kernel[..., perm] = hwio  # inverse of the export-side [..., perm]
        return kernel

    return t


def _offset_b_t(perm):
    def t(b):
        out = np.empty_like(b)
        out[perm] = b
        return out

    return t


def import_plan(flax_entries, torch_entries):
    """Per-leaf torch->flax transfer plan for the aligned primitives.

    Returns ``(param_items, stat_items)``:

    - param_items: (flax_path, leaf_name, torch_param, transform) for every
      trainable leaf — shared by the weight import and the optimizer-moment
      import (Adam moments are elementwise, so they transform exactly like
      their weights);
    - stat_items: (flax_path, leaf_name, torch_buffer, transform) for
      BatchNorm running stats (batch_stats collection, not optimized).
    """
    _assert_aligned(flax_entries, torch_entries)
    param_items = []
    stat_items = []
    for (kind, path), (_, tmod) in zip(flax_entries, torch_entries):
        if kind == "conv":
            param_items.append((path, "kernel", tmod.weight, _conv_t))
            if tmod.bias is not None:
                param_items.append((path, "bias", tmod.bias, _ident))
        elif kind == "deconv":
            param_items.append((path, "kernel", tmod.weight, _deconv_t))
            if tmod.bias is not None:
                param_items.append((path, "bias", tmod.bias, _ident))
        elif kind == "prelu":
            param_items.append((path, "alpha", tmod.weight, _ident))
        elif kind == "bn":
            param_items.append((path, "scale", tmod.weight, _ident))
            param_items.append((path, "bias", tmod.bias, _ident))
            stat_items.append((path, "mean", tmod.running_mean, _ident))
            stat_items.append((path, "var", tmod.running_var, _ident))
        elif kind in ("mdcn", "dcn"):
            param_items.append((path, "weight", tmod.weight, _pack_main_t))
            if tmod.bias is not None:
                param_items.append((path, "bias", tmod.bias, _ident))
            inner = (getattr(tmod, "conv_offset_mask", None)
                     or getattr(tmod, "conv_offset"))
            k2 = tmod.kernel_size[0] * tmod.kernel_size[1]
            perm = dcn_offset_perm(
                tmod.deformable_groups, k2, with_mask=(kind == "mdcn"))
            off_path = path + ("Conv_0",)
            param_items.append(
                (off_path, "kernel", inner.weight, _offset_w_t(perm)))
            param_items.append(
                (off_path, "bias", inner.bias, _offset_b_t(perm)))
        else:  # pragma: no cover
            raise AssertionError(kind)
    return param_items, stat_items


def import_torch_state(variables, flax_entries, torch_entries):
    """Return a new variables dict carrying the torch net's weights.

    The inverse of :func:`transplant`: every aligned primitive's torch
    weights are converted to the flax layout and written over a deep copy
    of ``variables``."""
    import jax

    param_items, stat_items = import_plan(flax_entries, torch_entries)

    # Deep-copy to plain nested dicts of numpy arrays we can mutate.
    def to_mutable(tree):
        if isinstance(tree, dict):
            return {k: to_mutable(v) for k, v in tree.items()}
        return np.asarray(tree)

    new_vars = to_mutable(jax.tree_util.tree_map(np.asarray, dict(variables)))
    for path, name, tparam, transform in param_items:
        sub = _get(new_vars["params"], path)
        sub[name] = _like(sub[name], transform(_np(tparam)))
    for path, name, tbuf, transform in stat_items:
        sub = _get(new_vars["batch_stats"], path)
        sub[name] = _like(sub[name], transform(_np(tbuf)))
    return new_vars
