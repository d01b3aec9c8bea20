"""Zoo-wide weight-transplant forward parity vs the ACTUAL reference nets.

Each test initializes the vsr_tpu flax net, perturbs every parameter (so
zero-initialized layers like DCN offset convs participate), transplants the
weights into the genuine reference torch module loaded from /root/reference
(see tests/_oracle.py for how the CUDA DCN extension and torch-1.1
grid_sample semantics are reproduced), and asserts the forward outputs agree
in fp32. This pins the *architecture* — a wrong stride, pad, activation
order, channel packing, or upsample convention in any net fails here.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests._oracle import (  # noqa: E402
    load_ref_net,
    torch11_grid_sample,
    torch_modulated_deform_conv,
)
from tests._transplant import (  # noqa: E402
    flax_leaf_order,
    perturb_variables,
    torch_leaf_order,
    transplant,
)

# Measured max |ours - golden| across the zoo is <= 5e-7 (fp32); 5e-6 leaves
# 10x headroom while still failing on the smallest semantic divergence tried
# (a DCN offset-channel permutation error shows up at ~2e-5).
ATOL = 5e-6
RTOL = 1e-5


def t_in(x):
    """NHWC float numpy -> torch NCHW tensor."""
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def f_of(t):
    """torch NCHW -> NHWC numpy."""
    return np.moveaxis(t.detach().numpy(), 1, -1)


def _check(ours, golden_nchw):
    np.testing.assert_allclose(
        np.asarray(ours), f_of(golden_nchw), rtol=RTOL, atol=ATOL)


def _run(net, x, tnet, run_fn, rng, apply_kwargs=None):
    """Transplant flax->torch and return (flax_out, torch_out)."""
    apply_kwargs = apply_kwargs or {}
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), **apply_kwargs)
    variables = perturb_variables(variables, rng)
    entries_f = flax_leaf_order(net, variables, jnp.asarray(x), **apply_kwargs)
    tnet = tnet.eval()
    entries_t = torch_leaf_order(tnet, run_fn)
    transplant(variables, entries_f, entries_t)
    with jax.default_matmul_precision("float32"):
        ours = net.apply(variables, jnp.asarray(x), **apply_kwargs)
    with torch.no_grad(), torch11_grid_sample():
        golden = run_fn(tnet)
    return ours, golden


def _frames(x):
    """NTHWC numpy -> list of torch NCHW frame tensors."""
    return [t_in(x[:, i]) for i in range(x.shape[1])]


def test_bicubic_matches_reference(rng):
    from vsr_tpu.models import Bicubic

    Ref = load_ref_net("src.model.nets.bicubic", "Bicubic")
    x = rng.random((2, 6, 7, 1), np.float32)
    net = Bicubic(upscale_factor=2)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    with jax.default_matmul_precision("float32"):
        ours = net.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        golden = Ref(upscale_factor=2)(t_in(x))
    _check(ours, golden)


@pytest.mark.parametrize("factor", [2, 3])
def test_edsr_matches_reference(rng, factor):
    from vsr_tpu.models import EDSRNet

    Ref = load_ref_net("src.model.nets.edsr_net", "EDSRNet")
    x = rng.random((2, 8, 8, 1), np.float32)
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2,
                  num_features=8, upscale_factor=factor)
    tnet = Ref(1, 1, 2, 8, factor)
    ours, golden = _run(net, x, tnet, lambda m: m(t_in(x)), rng)
    _check(ours, golden)


@pytest.mark.parametrize("factor", [2, 3])
def test_srfbn_matches_reference(rng, factor):
    from vsr_tpu.models import SRFBNet

    Ref = load_ref_net("src.model.nets.srfb_net", "SRFBNet")
    x = rng.random((2, 8, 8, 1), np.float32)
    net = SRFBNet(in_channels=1, out_channels=1, num_steps=3, num_features=8,
                  num_groups=3, upscale_factor=factor)
    tnet = Ref(1, 1, 3, 8, 3, factor)
    ours, golden = _run(net, x, tnet, lambda m: m(t_in(x)), rng)
    assert ours.shape[0] == 3
    for s in range(3):
        _check(ours[s], golden[s])


def test_drf_sisr_matches_reference(rng):
    from vsr_tpu.models import DRFSISRNet

    Ref = load_ref_net("src.model.nets.drf_sisr_net", "DRFSISRNet")
    x = rng.random((2, 8, 8, 1), np.float32)
    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=3,
                     num_features=8, num_groups=2, upscale_factor=2)
    tnet = Ref(1, 1, 3, 8, 2, 2)
    ours, golden = _run(net, x, tnet, lambda m: m(t_in(x)), rng)
    for s in range(3):
        _check(ours[s], golden[s])


def test_drf_vsr_matches_reference(rng):
    from vsr_tpu.models import DRFNet

    Ref = load_ref_net("src.model.nets.drf_net", "DRFNet")
    x = rng.random((1, 3, 8, 8, 1), np.float32)
    net = DRFNet(in_channels=1, out_channels=1, num_features=8, num_groups=2,
                 upscale_factor=2)
    tnet = Ref(1, 1, 8, 2, 2)
    ours, golden = _run(net, x, tnet, lambda m: m(_frames(x)), rng)
    for t in range(3):
        _check(ours[:, t], golden[t])


def test_frvsr_matches_reference(rng):
    from vsr_tpu.models import FRVSRNet

    Ref = load_ref_net("src.model.nets.frvsr_net", "FRVSRNet")
    x = rng.random((1, 3, 8, 8, 1), np.float32)
    net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                   num_resblocks=2)
    tnet = Ref(1, 1, 4, is_prediction=False, num_resblocks=2)
    (sr, warped), (g_sr, g_warped) = _run(
        net, x, tnet, lambda m: m(_frames(x)), rng)
    for t in range(3):
        _check(sr[:, t], g_sr[t])
        _check(warped[:, t], g_warped[t])


def test_toflow_matches_reference(rng):
    from vsr_tpu.models import TOFlowNet

    Ref = load_ref_net("src.model.nets.toflow_net", "TOFlowNet")
    x = rng.random((1, 3, 8, 8, 1), np.float32)
    net = TOFlowNet(in_channels=1, out_channels=1, num_frames=3,
                    upscale_factor=2)
    tnet = Ref(1, 1, 3, 2)
    ours, golden = _run(net, x, tnet, lambda m: m(_frames(x)), rng)
    _check(ours, golden)


def test_duf_matches_reference(rng):
    from vsr_tpu.models import DUFNet

    Ref = load_ref_net("src.model.nets.duf_net", "DUFNet")
    x = rng.random((1, 7, 8, 8, 1), np.float32)
    net = DUFNet(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
                 upscale_factor=2, backbone="_DenseLayer16")
    tnet = Ref(1, 1, 7, 5, 2, "_DenseLayer16")
    ours, golden = _run(net, x, tnet, lambda m: m(_frames(x)), rng)
    _check(ours, golden)


def test_rbpn_matches_reference(rng):
    from vsr_tpu.models import RBPNet

    Ref = load_ref_net("src.model.nets.rbp_net", "RBPNet")
    x = rng.random((1, 3, 8, 8, 1), np.float32)
    net = RBPNet(in_channels=1, out_channels=1, base_filter=8, feat=8,
                 num_stages=3, num_resblocks=2, num_frames=3,
                 upscale_factor=2)
    tnet = Ref(1, 1, 8, 8, 3, 2, 3, 2)
    # The reference forward pops the center frame from the input list —
    # build a fresh list per call (rbp_net.py:67).
    ours, golden = _run(net, x, tnet, lambda m: m(_frames(x)), rng)
    _check(ours, golden)


@pytest.mark.parametrize(
    "case",
    ["base", "padded", "no_tsa", "predeblur"],
)
def test_edvr_matches_reference(rng, case):
    from vsr_tpu.models import EDVRNet

    Ref = load_ref_net("src.model.nets.edvr_net.EDVR_arch", "EDVRNet")
    hw = 14 if case == "padded" else 12
    predeblur = case == "predeblur"
    w_tsa = case != "no_tsa"
    x = rng.random((1, 5, hw, hw, 1), np.float32)
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                  front_RBs=2, back_RBs=2, predeblur=predeblur, w_TSA=w_tsa)
    tnet = Ref(1, 1, nf=8, nframes=5, groups=2, front_RBs=2, back_RBs=2,
               predeblur=predeblur, w_TSA=w_tsa)
    ours, golden = _run(net, x, tnet, lambda m: m(_frames(x)), rng)
    _check(ours, golden)


def test_torch_dcn_stub_matches_jax_op(rng):
    """The pure-torch DCN used to drive the reference EDVR agrees with the
    (independently golden-tested) jax deform_conv2d on random offsets/masks —
    pinning the CUDA channel layout contract on both sides."""
    from vsr_tpu.ops.deform_conv import deform_conv2d

    n, h, w, cin, cout, k, dg = 2, 6, 6, 4, 5, 3, 2
    k2 = k * k
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    weight = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1
    bias = rng.standard_normal((cout,)).astype(np.float32)
    offsets = rng.standard_normal((n, h, w, dg, k2, 2)).astype(np.float32)
    mask = rng.random((n, h, w, dg, k2)).astype(np.float32)

    with jax.default_matmul_precision("float32"):
        ours = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                             jnp.asarray(weight), bias=jnp.asarray(bias),
                             mask=jnp.asarray(mask), stride=1, padding=1)

    # Repack into the CUDA layout: offset channel g*2*k2 + 2*m (+1), mask
    # channel g*k2 + m, NCHW.
    off_t = np.zeros((n, dg * 2 * k2, h, w), np.float32)
    msk_t = np.zeros((n, dg * k2, h, w), np.float32)
    for g in range(dg):
        for m in range(k2):
            off_t[:, g * 2 * k2 + 2 * m] = offsets[..., g, m, 0]
            off_t[:, g * 2 * k2 + 2 * m + 1] = offsets[..., g, m, 1]
            msk_t[:, g * k2 + m] = mask[..., g, m]
    with torch.no_grad():
        golden = torch_modulated_deform_conv(
            t_in(x), torch.from_numpy(off_t), torch.from_numpy(msk_t),
            torch.from_numpy(weight.transpose(3, 2, 0, 1).copy()),
            torch.from_numpy(bias), stride=1, padding=1, dilation=1,
            groups=1, deformable_groups=dg)
    _check(ours, golden)
