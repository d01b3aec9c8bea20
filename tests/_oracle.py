"""Load the reference PyTorch nets from /root/reference as golden oracles.

The reference is torch-1.1-era research code with a CUDA-only deformable-conv
extension. To run it under the modern CPU torch in this image:

- missing third-party modules (nibabel, cv2, ...) are stubbed — the net
  modules themselves never touch them, they only leak in via package
  ``__init__`` imports;
- the compiled ``deform_conv_cuda`` module is replaced by a dummy so the
  bridge imports, and the bridge's module-level ``deform_conv`` /
  ``modulated_deform_conv`` functions (resolved at call time by the Pack
  classes, ``dcn/deform_conv.py:195,291``) are monkeypatched with the
  pure-torch reimplementation below, which follows the CUDA kernels'
  semantics exactly (``dcn/src/deform_conv_cuda_kernel.cu:190-257,570-633``):
  per-deformable-group interleaved (h, w) offset channels, per-corner
  zero-padded bilinear taps, mask applied to the sampled column;
- ``F.grid_sample`` is wrapped to force ``align_corners=True`` — the
  torch-1.1 behavior the reference was written against (the kwarg did not
  exist yet; the default flipped to False in torch 1.3). Without this, FRVSR
  and TOFlow warps under modern torch silently compute something the
  original never did.

Everything here is test-only scaffolding: the framework itself never imports
the reference.
"""

from __future__ import annotations

import importlib
import sys
import types
from pathlib import Path

import pytest

REF_ROOT = Path("/root/reference")

_STUB_NAMES = [
    "cv2", "SimpleITK", "imageio",
    "tensorboardX", "torchvision", "torchvision.utils", "tqdm",
]
# nibabel / scipy.misc / box / ipdb get FUNCTIONAL shims from
# tests/_refharness.py (the protocol-parity oracle needs the reference's
# dataset/predictor IO to actually work); they are installed ahead of the
# inert stubs below so the reference modules bind the functional versions
# at their first import, whichever test file triggers it.

_DCN_MOD = "src.model.nets.edvr_net.dcn.deform_conv"
_DCN_CUDA_MOD = "src.model.nets.edvr_net.dcn.deform_conv_cuda"


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def torch_modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1,
                                padding=1, dilation=1, groups=1,
                                deformable_groups=1):
    """Pure-torch DCNv2 forward with the CUDA extension's exact layout.

    x: (N, Cin, H, W); offset: (N, dg*2*k2, Ho, Wo) with channel
    ``g*2*k2 + 2*tap`` = dy and ``+1`` = dx (interleaved, like the kernel at
    ``deform_conv_cuda_kernel.cu:607-611``); mask: (N, dg*k2, Ho, Wo);
    weight: (Cout, Cin, kh, kw).
    """
    import torch

    assert groups == 1, "reference EDVR uses groups=1"
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    n, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    k2 = kh * kw
    dg = deformable_groups
    cpg = cin // dg
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1

    off = offset.reshape(n, dg, k2, 2, ho, wo)
    gy = off[:, :, :, 0]
    gx = off[:, :, :, 1]
    base_y = (torch.arange(ho, dtype=x.dtype) * sh - ph).view(1, 1, 1, ho, 1)
    base_x = (torch.arange(wo, dtype=x.dtype) * sw - pw).view(1, 1, 1, 1, wo)
    tap_y = (torch.arange(kh, dtype=x.dtype) * dh).repeat_interleave(kw).view(1, 1, k2, 1, 1)
    tap_x = (torch.arange(kw, dtype=x.dtype) * dw).repeat(kh).view(1, 1, k2, 1, 1)
    gy = gy + base_y + tap_y  # (N, dg, k2, Ho, Wo)
    gx = gx + base_x + tap_x

    y0 = gy.floor()
    x0 = gx.floor()
    wy = gy - y0
    wx = gx - x0
    y0 = y0.long()
    x0 = x0.long()

    xg = x.reshape(n, dg, cpg, h * w)

    def tap(yi, xi):
        inb = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)).to(x.dtype)
        yc = yi.clamp(0, h - 1)
        xc = xi.clamp(0, w - 1)
        idx = (yc * w + xc).reshape(n, dg, 1, k2 * ho * wo).expand(n, dg, cpg, -1)
        v = torch.gather(xg, 3, idx).reshape(n, dg, cpg, k2, ho, wo)
        return v * inb.unsqueeze(2)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy.unsqueeze(2)
    wx = wx.unsqueeze(2)
    val = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
           + (v10 * (1 - wx) + v11 * wx) * wy)  # (N, dg, cpg, k2, Ho, Wo)

    if mask is not None:
        val = val * mask.reshape(n, dg, 1, k2, ho, wo)

    cols = val.reshape(n, cin, k2, ho * wo)
    out = torch.einsum("nckp,ock->nop", cols, weight.reshape(cout, cin, k2))
    out = out.reshape(n, cout, ho, wo)
    if bias is not None and bias.numel() == cout:
        out = out + bias.view(1, cout, 1, 1)
    return out


def torch_deform_conv(x, offset, weight, stride=1, padding=0, dilation=1,
                      groups=1, deformable_groups=1, im2col_step=64):
    """Pure-torch DCNv1 forward (no mask, no bias)."""
    return torch_modulated_deform_conv(
        x, offset, None, weight, bias=None, stride=stride, padding=padding,
        dilation=dilation, groups=groups, deformable_groups=deformable_groups)


def _dummy(*args, **kwargs):  # pragma: no cover
    raise RuntimeError("reference-oracle stub attribute called")


def _stub_getattr(attr):
    # Dunders must genuinely be absent: introspection machinery (e.g.
    # torch._dynamo scanning sys.modules for __file__) breaks if a module
    # "has" a callable __file__.
    if attr.startswith("__") and attr.endswith("__"):
        raise AttributeError(attr)
    return _dummy


def _install_stubs():
    from tests._refharness import install_functional_shims

    install_functional_shims()  # calls _install_inert_stubs itself


def _install_inert_stubs():
    for name in _STUB_NAMES:
        try:
            importlib.import_module(name)
        except Exception:
            parts = name.split(".")
            for i in range(len(parts)):
                modname = ".".join(parts[: i + 1])
                if modname not in sys.modules:
                    stub = types.ModuleType(modname)
                    stub.__getattr__ = _stub_getattr
                    sys.modules[modname] = stub
    if _DCN_CUDA_MOD not in sys.modules:
        sys.modules[_DCN_CUDA_MOD] = types.ModuleType(_DCN_CUDA_MOD)


def load_ref_net(modname: str, clsname: str):
    """Import a reference net class, skipping the test if /root/reference is
    absent. Patches the DCN bridge with the pure-torch forward."""
    if not REF_ROOT.exists():
        pytest.skip("reference repo not available")
    _install_stubs()
    ref = str(REF_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    mod = importlib.import_module(modname)
    try:
        dcn = importlib.import_module(_DCN_MOD)
        dcn.deform_conv = torch_deform_conv
        dcn.modulated_deform_conv = torch_modulated_deform_conv
    except Exception:
        pass  # nets that don't touch DCN still load
    return getattr(mod, clsname)


class torch11_grid_sample:
    """Context manager forcing F.grid_sample(align_corners=True) — the
    torch-1.1 semantics the reference ran under."""

    def __enter__(self):
        import torch.nn.functional as F

        self._orig = F.grid_sample

        def patched(input, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=None):
            return self._orig(input, grid, mode=mode,
                              padding_mode=padding_mode, align_corners=True)

        F.grid_sample = patched
        return self

    def __exit__(self, *exc):
        import torch.nn.functional as F

        F.grid_sample = self._orig
        return False
