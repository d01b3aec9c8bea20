"""End-to-end tests of the reference-checkpoint importer (vsr_tpu.convert).

Each case saves a reference-format ``.pth`` from the reference's OWN torch
net (randomized weights), converts it with the CLI-level ``convert()``, and
asserts our net's forward under the imported weights matches the reference
net's forward within the parity tolerance — the same bar as
tests/test_ref_parity.py, but entered through the user-facing tool.
"""

from __future__ import annotations

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests._oracle import load_ref_net, torch11_grid_sample  # noqa: E402
from tests.test_ref_parity import _check, _frames, t_in  # noqa: E402

from vsr_tpu.utils.checkpoint import load_checkpoint  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _write_config(tmp_path, name, kwargs, with_optimizer=False):
    cfg = {"net": {"name": name, "kwargs": kwargs}}
    if with_optimizer:
        cfg["optimizer"] = {"name": "Adam", "kwargs": {"lr": 1e-4}}
    path = tmp_path / "convert_cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path


def _perturb_torch(tnet, rng):
    """Randomize every param/buffer so zero-init layers participate."""
    with torch.no_grad():
        for p in tnet.parameters():
            p.add_(torch.from_numpy(
                rng.normal(0.0, 0.02, tuple(p.shape)).astype(np.float32)))
        for name, b in tnet.named_buffers():
            if b.dtype.is_floating_point:
                noise = rng.normal(0.0, 0.02, tuple(b.shape)).astype(np.float32)
                if name.endswith("running_var"):
                    b.mul_(torch.from_numpy(np.exp(noise)))
                else:
                    b.add_(torch.from_numpy(noise))


def _convert_case(tmp_path, rng, name, flax_net, net_kwargs, ref_args,
                  run_ref, with_optimizer=False):
    """Save a reference-style ckpt from the reference net, convert, return
    (converted variables, reference golden output, state, aux)."""
    from vsr_tpu.convert import REF_NETS, convert

    modname, _ = REF_NETS[name]
    Ref = load_ref_net(modname, name)
    tnet = Ref(*ref_args).eval()
    _perturb_torch(tnet, rng)
    ckpt_path = tmp_path / "ref.pth"
    torch.save({"net": tnet.state_dict(), "epoch": 7,
                "optimizer": {}}, ckpt_path)

    cfg_path = _write_config(tmp_path, name, net_kwargs, with_optimizer)
    out_path = tmp_path / "converted.ckpt"
    new_vars = convert(cfg_path, ckpt_path, out_path,
                       with_opt_template=with_optimizer)

    # convert() patched the reference DCN with shape-only fakes for order
    # capture; restore the faithful pure-torch oracle before the golden run.
    load_ref_net(modname, name)
    with torch.no_grad(), torch11_grid_sample():
        golden = run_ref(tnet)
    state, aux = load_checkpoint(out_path)
    return new_vars, golden, state, aux


def test_convert_edsr(tmp_path, rng):
    from vsr_tpu.models import EDSRNet

    kwargs = dict(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    x = rng.random((2, 8, 8, 1), np.float32)
    new_vars, golden, state, aux = _convert_case(
        tmp_path, rng, "EDSRNet", EDSRNet(**kwargs), kwargs,
        (1, 1, 2, 8, 2), lambda m: m(t_in(x)), with_optimizer=True)

    net = EDSRNet(**kwargs)
    with jax.default_matmul_precision("float32"):
        ours = net.apply(
            jax.tree_util.tree_map(jnp.asarray, new_vars), jnp.asarray(x))
    _check(ours, golden)
    assert aux["epoch"] == 7
    assert "opt_state" in state  # --with-opt-template: trainer-resumable


def test_convert_drf_vsr(tmp_path, rng):
    from vsr_tpu.models import DRFNet

    kwargs = dict(in_channels=1, out_channels=1, num_features=8,
                  num_groups=2, upscale_factor=2)
    x = rng.random((1, 3, 8, 8, 1), np.float32)
    new_vars, golden, _, _ = _convert_case(
        tmp_path, rng, "DRFNet", DRFNet(**kwargs), kwargs,
        (1, 1, 8, 2, 2), lambda m: m(_frames(x)))

    net = DRFNet(**kwargs)
    with jax.default_matmul_precision("float32"):
        ours = net.apply(
            jax.tree_util.tree_map(jnp.asarray, new_vars), jnp.asarray(x))
    for t in range(3):
        _check(ours[:, t], golden[t])


def test_convert_duf_with_batchnorm(tmp_path, rng):
    from vsr_tpu.models import DUFNet

    kwargs = dict(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
                  upscale_factor=2, backbone="_DenseLayer16")
    x = rng.random((1, 7, 8, 8, 1), np.float32)
    new_vars, golden, _, _ = _convert_case(
        tmp_path, rng, "DUFNet", DUFNet(**kwargs), kwargs,
        (1, 1, 7, 5, 2, "_DenseLayer16"), lambda m: m(_frames(x)))

    net = DUFNet(**kwargs)
    with jax.default_matmul_precision("float32"):
        ours = net.apply(
            jax.tree_util.tree_map(jnp.asarray, new_vars), jnp.asarray(x),
            train=False)
    _check(ours, golden)


def test_convert_edvr_with_dcn(tmp_path, rng):
    from vsr_tpu.models import EDVRNet

    kwargs = dict(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                  front_RBs=2, back_RBs=2)
    x = rng.random((1, 5, 16, 16, 1), np.float32)

    from vsr_tpu.convert import convert

    Ref = load_ref_net("src.model.nets.edvr_net.EDVR_arch", "EDVRNet")
    tnet = Ref(1, 1, nf=8, nframes=5, groups=2, front_RBs=2, back_RBs=2).eval()
    _perturb_torch(tnet, rng)
    ckpt_path = tmp_path / "ref.pth"
    torch.save({"net": tnet.state_dict()}, ckpt_path)
    cfg_path = _write_config(tmp_path, "EDVRNet", kwargs)
    new_vars = convert(cfg_path, ckpt_path, tmp_path / "out.ckpt")

    load_ref_net("src.model.nets.edvr_net.EDVR_arch", "EDVRNet")  # re-patch
    with torch.no_grad(), torch11_grid_sample():
        golden = tnet(_frames(x))

    net = EDVRNet(**kwargs)
    with jax.default_matmul_precision("float32"):
        ours = net.apply(
            jax.tree_util.tree_map(jnp.asarray, new_vars), jnp.asarray(x))
    _check(ours, golden)


def test_convert_rejects_mismatched_state_dict(tmp_path, rng):
    from vsr_tpu.convert import convert

    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    tnet = Ref(1, 1, 2, 8, 2)
    torch.save({"net": tnet.state_dict()}, tmp_path / "ref.pth")
    # Config says 3 resblocks; the checkpoint has 2 -> loud failure.
    cfg_path = _write_config(
        tmp_path, "EDSRNet",
        dict(in_channels=1, out_channels=1, num_resblocks=3, num_features=8,
             upscale_factor=2))
    with pytest.raises(SystemExit, match="does not match"):
        convert(cfg_path, tmp_path / "ref.pth", tmp_path / "out.ckpt")


def test_converted_checkpoint_loads_in_predictor_format(tmp_path, rng):
    """The written file restores onto a freshly initialized params tree the
    way BasePredictor.load does (flax from_state_dict round trip)."""
    from flax import serialization

    from vsr_tpu.models import EDSRNet

    kwargs = dict(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    x = rng.random((2, 8, 8, 1), np.float32)
    new_vars, _, state, _ = _convert_case(
        tmp_path, rng, "EDSRNet", EDSRNet(**kwargs), kwargs,
        (1, 1, 2, 8, 2), lambda m: m(t_in(x)))

    net = EDSRNet(**kwargs)
    template = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    restored = serialization.from_state_dict(template, state["params"])
    flat_a = jax.tree_util.tree_leaves(restored)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(jnp.asarray, new_vars))
    assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))


def test_convert_imports_adam_moments(tmp_path, rng):
    """--import-opt carries real torch Adam moments into the optax state:
    run genuine torch training steps so exp_avg/exp_avg_sq/step are
    populated, convert, and check the ScaleByAdamState matches the
    layout-transformed torch moments exactly."""
    import optax
    from flax import serialization

    from vsr_tpu.convert import convert
    from vsr_tpu.registry import build

    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    tnet = Ref(1, 1, 2, 8, 2)
    opt = torch.optim.Adam(tnet.parameters(), lr=1e-3)
    for _ in range(3):
        x = torch.from_numpy(rng.random((2, 1, 8, 8), np.float32))
        y = torch.from_numpy(rng.random((2, 1, 16, 16), np.float32))
        opt.zero_grad()
        torch.nn.functional.l1_loss(tnet(x), y).backward()
        opt.step()
    ckpt_path = tmp_path / "ref.pth"
    torch.save({"net": tnet.state_dict(), "optimizer": opt.state_dict(),
                "epoch": 3}, ckpt_path)

    kwargs = dict(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=2)
    cfg_path = _write_config(tmp_path, "EDSRNet", kwargs, with_optimizer=True)
    out_path = tmp_path / "converted.ckpt"
    convert(cfg_path, ckpt_path, out_path, import_opt=True)

    # Restore through the trainer-style template round trip.
    from vsr_tpu.config import load_config
    from vsr_tpu.main import build_net

    config = load_config(cfg_path)
    net = build_net(config)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    tx = build("optimizer", config.optimizer)
    template = {"params": variables, "opt_state": tx.init(variables["params"])}
    state, aux = load_checkpoint(out_path, template)

    adam = [s for s in jax.tree_util.tree_leaves(
                state["opt_state"], is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
            if isinstance(s, optax.ScaleByAdamState)]
    assert len(adam) == 1
    adam = adam[0]
    assert int(adam.count) == 3

    # First torch param is the head conv weight; its flax twin is the first
    # kernel leaf in execution order — compare via the documented layout map.
    tparams = list(tnet.parameters())
    texp_avg = opt.state_dict()["state"][0]["exp_avg"].numpy()
    flat_mu = {jax.tree_util.keystr(p): np.asarray(v)
               for p, v in jax.tree_util.tree_flatten_with_path(adam.mu)[0]}
    want = texp_avg.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    matches = [k for k, v in flat_mu.items()
               if v.shape == want.shape and np.allclose(v, want, atol=0)]
    assert matches, "no mu leaf equals the transformed torch exp_avg"
    # And nothing is left at zero except genuine zero-moment leaves.
    nonzero = sum(np.any(v) for v in flat_mu.values())
    assert nonzero == len([p for p in tparams])


def test_convert_import_opt_non_adam_falls_back(tmp_path, rng, caplog):
    """--import-opt with a non-Adam optimizer in the target config must fall
    back to a fresh optimizer state with a warning (documented behavior),
    not crash, even when the torch checkpoint carries Adam moments."""
    import logging

    from vsr_tpu.convert import convert

    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    tnet = Ref(1, 1, 2, 8, 2)
    opt = torch.optim.Adam(tnet.parameters(), lr=1e-3)
    x = torch.from_numpy(rng.random((2, 1, 8, 8), np.float32))
    y = torch.from_numpy(rng.random((2, 1, 16, 16), np.float32))
    opt.zero_grad()
    torch.nn.functional.l1_loss(tnet(x), y).backward()
    opt.step()
    ckpt_path = tmp_path / "ref.pth"
    torch.save({"net": tnet.state_dict(), "optimizer": opt.state_dict(),
                "epoch": 1}, ckpt_path)

    cfg = {"net": {"name": "EDSRNet",
                   "kwargs": dict(in_channels=1, out_channels=1,
                                  num_resblocks=2, num_features=8,
                                  upscale_factor=2)},
           "optimizer": {"name": "SGD", "kwargs": {"lr": 1e-2}}}
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_path = tmp_path / "converted.ckpt"
    with caplog.at_level(logging.WARNING):
        convert(cfg_path, ckpt_path, out_path, import_opt=True)
    assert out_path.exists()
    assert any("not imported" in r.message for r in caplog.records)
