"""Execute the reference's OWN runner (``/root/reference/src/main.py``) as an
end-to-end oracle.

Round-2 parity pinned every *net's* forward (tests/test_ref_parity.py); this
module closes the last layer of the protocol claim by running the reference's
composed test path — dataset windowing, denormalize-then-metric ordering,
T-weighted log averaging, Cardiac bbox cropping, CSV row semantics
(``src/runner/predictors/*.py``, ``src/main.py:110-156``) — on a shared
mini-dataset, so tests can diff its results.csv / final log against
``vsr_tpu.main --test`` byte for byte (within fp32).

The reference's missing third-party deps get FUNCTIONAL shims here (not the
inert stubs of tests/_oracle.py):

- ``box.Box``      -> a minimal attribute-access dict with the from_yaml /
                      to_dict / get / update / pop surface src/main.py uses;
- ``nibabel``      -> load().get_data() / .header.get_data_shape() backed by
                      the repo's own NIfTI reader (both frameworks then read
                      the very same bytes);
- ``scipy.misc``   -> imsave via imageio (removed from modern scipy);
- ``ipdb``         -> import-only stub (src/main.py imports it at top level).

cv2 / SimpleITK / tensorboardX / torchvision remain inert stubs from
tests/_oracle.py — the reference's *test* path never calls into them.
Everything here is test scaffolding; the framework never imports this.
"""

from __future__ import annotations

import ast
import importlib
import logging
import sys
import types
from pathlib import Path

import numpy as np
import yaml

from tests._oracle import (
    REF_ROOT,
    _install_inert_stubs,
    torch11_grid_sample,
    torch_deform_conv,
    torch_modulated_deform_conv,
    _DCN_MOD,
)


class Box(dict):
    """Minimal functional python-box.Box: recursive attribute-access dict."""

    def __init__(self, data=None, **kw):
        super().__init__()
        for k, v in dict(data or {}, **kw).items():
            dict.__setitem__(self, k, _convert(v))

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        dict.__setitem__(self, key, _convert(value))

    @classmethod
    def from_yaml(cls, filename=None):
        with open(filename) as f:
            return cls(yaml.safe_load(f))

    def to_dict(self):
        def plain(v):
            if isinstance(v, Box):
                return {k: plain(x) for k, x in v.items()}
            if isinstance(v, list):
                return [plain(x) for x in v]
            return v

        return plain(self)


def _convert(v):
    if isinstance(v, Box):
        return v
    if isinstance(v, dict):
        return Box(v)
    if isinstance(v, list):
        return [_convert(x) for x in v]
    return v


class _NiftiImage:
    def __init__(self, path):
        self._path = str(path)
        self._data = None

    def _load(self):
        if self._data is None:
            from vsr_tpu.io.nifti import load_nifti

            self._data = np.asarray(load_nifti(self._path))
        return self._data

    def get_data(self):
        return self._load()

    @property
    def header(self):
        img = self

        class _Header:
            def get_data_shape(self):
                return img._load().shape

        return _Header()


def install_functional_shims() -> None:
    """Idempotent: register the functional shims, then the inert stubs for
    everything else the reference imports."""
    if "box" not in sys.modules or not hasattr(sys.modules["box"], "Box"):
        box_mod = types.ModuleType("box")
        box_mod.Box = Box
        sys.modules["box"] = box_mod

    # NB: the inert stubs from tests/_oracle.py define a module-level
    # __getattr__, so probe __dict__ directly — getattr() would return a
    # truthy dummy for ANY attribute and skip the functional replacement.
    nib = sys.modules.get("nibabel")
    if nib is None or not nib.__dict__.get("_vsr_functional", False):
        nib = types.ModuleType("nibabel")
        nib._vsr_functional = True
        nib.load = _NiftiImage
        sys.modules["nibabel"] = nib

    sys.modules.setdefault("ipdb", types.ModuleType("ipdb"))

    misc = sys.modules.get("scipy.misc")
    if misc is None or not misc.__dict__.get("_vsr_functional", False):
        try:
            import imageio

            _imsave = lambda path, img: imageio.imwrite(str(path), img)  # noqa: E731
        except ImportError:  # keep forward-parity tests usable without IO
            def _imsave(path, img):
                raise RuntimeError(
                    "scipy.misc.imsave shim needs imageio (not installed); "
                    "only the protocol-parity tests that export PNGs need it")
        misc = types.ModuleType("scipy.misc")
        misc._vsr_functional = True
        misc.imsave = _imsave
        sys.modules["scipy.misc"] = misc

    tv = sys.modules.get("torchvision.utils")
    if tv is None or not tv.__dict__.get("_vsr_functional", False):
        tv_pkg = types.ModuleType("torchvision")
        tv = types.ModuleType("torchvision.utils")
        tv._vsr_functional = True
        tv.make_grid = _make_grid
        tv_pkg.utils = tv
        sys.modules["torchvision"] = tv_pkg
        sys.modules["torchvision.utils"] = tv

    _install_inert_stubs()  # cv2 / SimpleITK / tensorboardX (if needed)


def _make_grid(tensor, nrow=8, normalize=False, scale_each=False,
               pad_value=0, padding=2):
    """Functional stand-in for torchvision.utils.make_grid: the reference
    loggers only feed the result to TensorBoard's add_image, so any valid
    (C, H, W) grid works — this stacks the batch in a single column with
    per-image min-max normalization (the kwargs the loggers pass)."""
    import torch

    imgs = tensor if isinstance(tensor, (list, tuple)) else list(tensor)
    rows = []
    for img in imgs:
        img = img.detach().float()
        if normalize:
            lo, hi = img.min(), img.max()
            img = (img - lo) / (hi - lo + 1e-10)
        rows.append(
            torch.nn.functional.pad(img, (padding,) * 4, value=pad_value))
    return torch.cat(rows, dim=-2)


class _LogCapture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines: list[str] = []

    def emit(self, record):
        self.lines.append(record.getMessage())


def run_reference_main(config_path: str | Path, test: bool = True) -> dict:
    """Run the reference ``src.main.main`` in-process on ``config_path``.

    Returns the reference's final log dict (the ``Test log: {...}`` /
    last ``Valid log`` line), parsed with ast.literal_eval.
    """
    if not REF_ROOT.exists():  # pragma: no cover
        import pytest

        pytest.skip("reference repo not available")
    install_functional_shims()
    ref = str(REF_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    importlib.import_module("src")
    dcn = importlib.import_module(_DCN_MOD)
    dcn.deform_conv = torch_deform_conv
    dcn.modulated_deform_conv = torch_modulated_deform_conv
    main_mod = importlib.import_module("src.main")
    # The reference resolves Box at module scope (``from box import Box``);
    # rebind in case src.main was imported before our shim.
    main_mod.Box = Box

    args = types.SimpleNamespace(config_path=Path(config_path), test=test)
    capture = _LogCapture()
    root = logging.getLogger()
    old_level = root.level
    root.addHandler(capture)
    root.setLevel(logging.INFO)
    try:
        with torch11_grid_sample():
            main_mod.main(args)
    finally:
        root.removeHandler(capture)
        root.setLevel(old_level)

    tag = "Test log: " if test else "Valid log: "
    finals = [l for l in capture.lines if l.startswith(tag)]
    assert finals, f"no '{tag}' line in reference output: {capture.lines[-5:]}"
    payload = finals[-1][len(tag):].rstrip(".")
    return ast.literal_eval(payload)


def read_results_csv(path: str | Path):
    """results.csv -> (header, [name...], float matrix rows)."""
    import csv

    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    names = [r[0] for r in body]
    values = np.asarray([[float(x) for x in r[1:]] for r in body])
    return header, names, values
