"""Import a trained reference torch checkpoint into a vsr_tpu checkpoint.

The reference saves ``torch.save({'net': state_dict, 'optimizer': ...})``
(``/root/reference/src/runner/trainers/base_trainer.py:229-236``). This CLI
loads such a ``.pth`` into the reference's own net class (imported from the
user's reference checkout — reference code is *not* bundled), captures both
frameworks' execution-order leaf sequences, converts every weight to the
flax layout (``vsr_tpu.interop``), and writes a vsr_tpu ``.ckpt`` usable as
``main.loaded_path`` for ``--test`` / serving / ``vsr_tpu.infer`` /
``vsr_tpu.export``, so reference users can switch without retraining.

Usage::

    python -m vsr_tpu.convert --config configs/test/acdc_sisr_edsr_x2.yaml \
        --torch-ckpt /path/to/model_400.pth --out converted.ckpt \
        [--ref-root /root/reference] [--with-opt-template]

The net name + kwargs come from the config's ``net`` section (same schema
both frameworks). ``--with-opt-template`` additionally stores a freshly
initialized optimizer state built from the config's ``optimizer`` section so
the checkpoint also loads through the *trainer* path (continue training;
moments start fresh — torch Adam moments are not imported).

The reference EDVR's DCN CUDA extension is not needed: the forward run that
captures execution order only needs shape-correct activations, so the
deformable convs are patched with their plain-conv counterparts (weights
come from the state_dict, not the forward pass).
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import logging
import sys
import types
from pathlib import Path

import numpy as np

from vsr_tpu.config import load_config
from vsr_tpu.main import build_net
from vsr_tpu.utils.checkpoint import save_checkpoint

_DCN_PKG = "src.model.nets.edvr_net.dcn.deform_conv"
_DCN_CUDA = "src.model.nets.edvr_net.dcn.deform_conv_cuda"

#: net name -> (reference module, call pattern). Patterns: "image" = one
#: NCHW tensor; "frames" = list of per-frame NCHW tensors
#: (``base_trainer.py`` feeds VSR/MISR nets frame lists).
REF_NETS = {
    "Bicubic": ("src.model.nets.bicubic", "image"),
    "EDSRNet": ("src.model.nets.edsr_net", "image"),
    "SRFBNet": ("src.model.nets.srfb_net", "image"),
    "DRFSISRNet": ("src.model.nets.drf_sisr_net", "image"),
    "DRFNet": ("src.model.nets.drf_net", "frames"),
    "FRVSRNet": ("src.model.nets.frvsr_net", "frames"),
    "TOFlowNet": ("src.model.nets.toflow_net", "frames"),
    "DUFNet": ("src.model.nets.duf_net", "frames"),
    "RBPNet": ("src.model.nets.rbp_net", "frames"),
    "EDVRNet": ("src.model.nets.edvr_net.EDVR_arch", "frames"),
}

#: frames needed by the order-capture forward per net (else 3).
_MIN_T = {"DUFNet": "num_frames", "TOFlowNet": "num_frames",
          "RBPNet": "num_frames", "EDVRNet": "nframes"}


def _fake_modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1,
                                padding=1, dilation=1, groups=1,
                                deformable_groups=1):
    import torch.nn.functional as F

    return F.conv2d(x, weight, bias, stride, padding, dilation, groups)


def _fake_deform_conv(x, offset, weight, stride=1, padding=0, dilation=1,
                      groups=1, deformable_groups=1, im2col_step=64):
    import torch.nn.functional as F

    return F.conv2d(x, weight, None, stride, padding, dilation, groups)


#: Third-party modules the reference's top-level ``src/__init__.py`` pulls
#: in transitively. The *nets* need none of them at conversion time, but
#: importing any net module executes the whole package init; absent ones
#: get import-only stubs (real installs are used when present).
_REF_OPTIONAL_DEPS = [
    "cv2", "SimpleITK", "imageio", "tensorboardX", "torchvision",
    "torchvision.utils", "tqdm", "nibabel", "box", "ipdb", "scipy.misc",
]


def _stub_getattr(attr):
    # Dunders must genuinely be absent: introspection machinery (e.g.
    # torch._dynamo scanning sys.modules for __file__) breaks if a module
    # "has" a callable __file__.
    if attr.startswith("__") and attr.endswith("__"):
        raise AttributeError(attr)

    def _dummy(*a, **k):
        raise RuntimeError(
            f"reference dependency stub used at conversion time: {attr}")

    return _dummy


def _stub_missing_deps() -> None:
    for name in _REF_OPTIONAL_DEPS:
        try:
            mod = importlib.import_module(name)
            if name == "scipy.misc" and not hasattr(mod, "imsave"):
                # Modern scipy keeps an empty scipy.misc; the reference's
                # predictors do `from scipy.misc import imsave` at import.
                mod.imsave = _stub_getattr("scipy.misc.imsave")
        except Exception:
            parts = name.split(".")
            for i in range(len(parts)):
                modname = ".".join(parts[: i + 1])
                if modname not in sys.modules:
                    stub = types.ModuleType(modname)
                    stub.__getattr__ = _stub_getattr
                    sys.modules[modname] = stub


def load_reference_net_class(name: str, ref_root: str | Path):
    """Import the reference's net class from the user's checkout."""
    if name not in REF_NETS:
        raise SystemExit(
            f"No reference counterpart known for net {name!r}; "
            f"supported: {sorted(REF_NETS)}")
    modname, _ = REF_NETS[name]
    ref_root = Path(ref_root)
    if not (ref_root / "src").is_dir():
        raise SystemExit(f"--ref-root {ref_root} has no src/ package")
    if str(ref_root) not in sys.path:
        sys.path.insert(0, str(ref_root))
    _stub_missing_deps()
    if _DCN_CUDA not in sys.modules:
        # The compiled CUDA extension is absent (and unnecessary — see
        # module docstring); give the bridge an empty module to import.
        sys.modules[_DCN_CUDA] = types.ModuleType(_DCN_CUDA)
    mod = importlib.import_module(modname)
    try:
        dcn = importlib.import_module(_DCN_PKG)
        dcn.deform_conv = _fake_deform_conv
        dcn.modulated_deform_conv = _fake_modulated_deform_conv
    except Exception:
        pass  # nets that don't touch DCN still convert
    return getattr(mod, name)


def _reference_kwargs(ref_cls, kwargs: dict) -> dict:
    """Drop vsr_tpu-only net kwargs the reference constructor lacks."""
    sig = inspect.signature(ref_cls.__init__)
    accepted = set(sig.parameters) - {"self"}
    dropped = {k for k in kwargs if k not in accepted}
    if dropped:
        logging.info("Dropping vsr_tpu-only net kwargs: %s", sorted(dropped))
    return {k: v for k, v in kwargs.items() if k in accepted}


def _example_input(name: str, kwargs: dict) -> np.ndarray:
    """Small NHWC / NTHWC input for the order-capture forward passes."""
    c = int(kwargs.get("in_channels", 1))
    hw = 16 if name == "EDVRNet" else 8  # EDVR downsamples twice in PCD
    _, pattern = REF_NETS[name]
    if pattern == "image":
        return np.zeros((1, hw, hw, c), np.float32)
    t_key = _MIN_T.get(name)
    t = int(kwargs[t_key]) if t_key and t_key in kwargs else 3
    return np.zeros((1, max(t, 2), hw, hw, c), np.float32)


def _run_fn(name: str, x: np.ndarray):
    import torch

    _, pattern = REF_NETS[name]
    if pattern == "image":
        t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        return lambda m: m(t)
    # Fresh frame list per call: RBPN pops the center frame (rbp_net.py:67).
    return lambda m: m([
        torch.from_numpy(np.moveaxis(x[:, i], -1, 1).copy())
        for i in range(x.shape[1])
    ])


def _replace_adam_state(opt_state, mu, nu, count):
    """Return ``opt_state`` with every ScaleByAdamState's moments swapped."""
    import jax.numpy as jnp
    import optax

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jnp.asarray(count, node.count.dtype), mu=mu, nu=nu)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*(walk(c) for c in node))
        if isinstance(node, (list, tuple)):
            return type(node)(walk(c) for c in node)
        return node

    replaced = walk(opt_state)
    assert any(isinstance(leaf, optax.ScaleByAdamState)
               for leaf in _iter_namedtuples(opt_state)), (
        "optimizer state has no Adam moments to replace")
    return replaced


def _iter_namedtuples(node):
    yield node
    if isinstance(node, (list, tuple)):
        for c in node:
            yield from _iter_namedtuples(c)


def _import_adam_moments(tx, new_vars, flax_entries, torch_entries, tnet,
                         opt_sd):
    """Build an opt_state carrying the torch Adam moments, or (None, why).

    torch.optim state_dicts key per-param state by the param's position in
    ``net.parameters()`` (the reference passes exactly that iterator,
    ``/root/reference/src/main.py:73``); each Adam entry holds
    ``step``/``exp_avg``/``exp_avg_sq``. Moments are elementwise, so they
    transform to the flax layout with the same per-leaf transforms as the
    weights (``interop.import_plan``).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vsr_tpu import interop

    tstate = opt_sd.get("state") if isinstance(opt_sd, dict) else None
    if not tstate:
        return None, "the torch checkpoint has no optimizer state"
    idx_of = {id(p): i for i, p in enumerate(tnet.parameters())}
    param_items, _ = interop.import_plan(flax_entries, torch_entries)

    def zeros_like_tree(tree):
        if isinstance(tree, dict):
            return {k: zeros_like_tree(v) for k, v in tree.items()}
        return np.zeros_like(np.asarray(tree), dtype=np.float32)

    params = new_vars["params"]
    mu, nu = zeros_like_tree(params), zeros_like_tree(params)
    steps = set()
    for path, leaf, tparam, transform in param_items:
        i = idx_of[id(tparam)]
        st = tstate.get(i, tstate.get(str(i)))
        if st is None or "exp_avg" not in st:
            return None, f"torch param {i} has no Adam moments"
        steps.add(int(st["step"]))
        for tree, key in ((mu, "exp_avg"), (nu, "exp_avg_sq")):
            sub = tree
            for k in path:
                sub = sub[k]
            moment = transform(st[key].detach().cpu().numpy())
            assert moment.shape == sub[leaf].shape, (moment.shape, sub[leaf].shape)
            sub[leaf] = moment.astype(np.float32)
    if len(steps) != 1:
        return None, f"per-param step counts differ: {sorted(steps)[:5]}"
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    opt_state = tx.init(to_jnp(params))
    if not any(isinstance(leaf, optax.ScaleByAdamState)
               for leaf in _iter_namedtuples(opt_state)):
        return None, ("the configured optimizer has no Adam moment state "
                      "(non-Adam optimizer in the target config)")
    return _replace_adam_state(opt_state, to_jnp(mu), to_jnp(nu),
                               steps.pop()), None


def convert(config_path: str | Path, torch_ckpt: str | Path,
            out_path: str | Path, ref_root: str | Path = "/root/reference",
            with_opt_template: bool = False, import_opt: bool = False) -> dict:
    """Run the conversion; returns the new variables dict."""
    import jax
    import jax.numpy as jnp
    import torch

    from vsr_tpu import interop

    config = load_config(config_path)
    name = config.net.name
    net_kwargs = dict(config.net.get("kwargs") or {})
    net = build_net(config)

    x = _example_input(name, net_kwargs)
    init_kwargs = {}
    if "train" in inspect.signature(net.__call__).parameters:
        init_kwargs["train"] = False
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), **init_kwargs)
    flax_entries = interop.flax_leaf_order(
        net, variables, jnp.asarray(x), **init_kwargs)

    ref_cls = load_reference_net_class(name, ref_root)
    tnet = ref_cls(**_reference_kwargs(ref_cls, net_kwargs)).eval()

    payload = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
    state_dict = payload.get("net", payload) if isinstance(payload, dict) else payload
    if hasattr(state_dict, "state_dict"):  # a whole pickled module
        state_dict = state_dict.state_dict()
    missing, unexpected = tnet.load_state_dict(state_dict, strict=False)
    if missing or unexpected:
        raise SystemExit(
            f"state_dict does not match reference net {name}: "
            f"missing={list(missing)[:8]} unexpected={list(unexpected)[:8]} "
            f"(check the config's net kwargs against the training run)")

    torch_entries = interop.torch_leaf_order(tnet, _run_fn(name, x))
    new_vars = interop.import_torch_state(variables, flax_entries, torch_entries)

    state = {"params": new_vars}
    if with_opt_template or import_opt:
        from vsr_tpu.registry import build

        tx = build("optimizer", config.optimizer)
        opt_state = None
        if import_opt:
            opt_sd = payload.get("optimizer") if isinstance(payload, dict) else None
            opt_state, why = _import_adam_moments(
                tx, new_vars, flax_entries, torch_entries, tnet, opt_sd or {})
            if opt_state is None:
                logging.warning(
                    "Optimizer moments not imported (%s); storing a fresh "
                    "optimizer state instead.", why)
            else:
                logging.info("Imported torch Adam moments (step=%d).",
                             int(opt_sd["state"][next(iter(opt_sd["state"]))]["step"]))
        if opt_state is None:
            opt_state = tx.init(new_vars["params"])
        state["opt_state"] = opt_state
    aux = {
        "epoch": int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0,
        "monitor": {"best": None, "best_sign": 1, "not_improved_count": 0},
        "lr_scheduler": None,
        "random_seed": "converted",
        "converted_from": str(torch_ckpt),
        "net": name,
    }
    save_checkpoint(out_path, state, aux)
    n_leaves = len(jax.tree_util.tree_leaves(new_vars))
    logging.info("Wrote %s (%d arrays, %d aligned primitives).",
                 out_path, n_leaves, len(flax_entries))
    return new_vars


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import sys

    args_in = sys.argv[1:] if argv is None else list(argv)
    if args_in[:1] == ["--consolidate"]:
        # Standalone mode: stitch a sharded-v1 checkpoint (per-process
        # shard files from trainer.kwargs.sharded_ckpt) into a plain
        # gathered .ckpt — pure numpy, runs on any host with the files.
        cap = argparse.ArgumentParser(
            description="Consolidate a sharded checkpoint into a plain one.")
        cap.add_argument("--consolidate", nargs=2,
                         metavar=("SHARDED_CKPT", "OUT_CKPT"), required=True)
        a = cap.parse_args(args_in)
        from vsr_tpu.utils.checkpoint import consolidate_sharded_checkpoint

        consolidate_sharded_checkpoint(*a.consolidate)
        logging.info(f"Consolidated {a.consolidate[0]} -> {a.consolidate[1]}")
        return
    ap = argparse.ArgumentParser(
        description="Convert a reference torch checkpoint to a vsr_tpu one.")
    ap.add_argument("--config", required=True,
                    help="train/test YAML naming the net (same schema as the "
                         "reference's)")
    ap.add_argument("--torch-ckpt", required=True, help=".pth from the reference")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    ap.add_argument("--ref-root", default="/root/reference",
                    help="path to the reference checkout (its src/ package)")
    ap.add_argument("--with-opt-template", action="store_true",
                    help="also store a fresh optimizer state so the trainer "
                         "can resume from this checkpoint")
    ap.add_argument("--import-opt", action="store_true",
                    help="like --with-opt-template, but import the torch "
                         "Adam moments (exp_avg/exp_avg_sq/step) so training "
                         "continues exactly where the reference left off; "
                         "falls back to a fresh state with a warning for "
                         "non-Adam optimizers or moment-less checkpoints")
    args = ap.parse_args(argv)
    convert(args.config, args.torch_ckpt, args.out, args.ref_root,
            args.with_opt_template, args.import_opt)


if __name__ == "__main__":
    main()
