"""Fused sub-pixel tail: fold the final conv through pixel_shuffle.

The fused and unfused modes share one parameter set; outputs must match up
to float reassociation (measured +8.6% EDSR serving on the chip — BENCH.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import DRFNet, DRFSISRNet, EDSRNet
from vsr_tpu.ops.fused_tail import conv_through_shuffle, fuse_conv_through_shuffle
from vsr_tpu.ops.pixel_shuffle import pixel_shuffle


@pytest.mark.parametrize("r,cin,cout,k", [(2, 8, 1, 3), (3, 4, 2, 3), (4, 4, 3, 3)])
def test_fold_matches_direct(rng, r, cin, cout, k):
    pre = jnp.asarray(rng.standard_normal((2, 6, 6, cin * r * r)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = jax.lax.conv_general_dilated(
            pixel_shuffle(pre, r), w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = conv_through_shuffle(pre, w, b, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_kernel_preserves_energy(rng):
    """Every original weight lands in exactly one slot of the fused kernel."""
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 2)).astype(np.float32))
    K, B = fuse_conv_through_shuffle(w, jnp.zeros((2,)), 2)
    np.testing.assert_allclose(float(jnp.sum(K**2)),
                               4 * float(jnp.sum(w**2)), rtol=1e-5)


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_edsr_fused_tail_equivalent(rng, factor):
    x = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                  num_features=4, upscale_factor=factor)
    fused = net.clone(fused_tail=True)
    params = net.init(jax.random.PRNGKey(0), x)
    with jax.default_matmul_precision("float32"):
        a = net.apply(params, x)
        b = fused.apply(params, x)  # SAME params, fused graph
    assert a.shape == (1, 8 * factor, 8 * factor, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_drf_fused_tail_equivalent(rng):
    x = jnp.asarray(rng.random((1, 3, 8, 8, 1)).astype(np.float32))
    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                 upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), x)
    with jax.default_matmul_precision("float32"):
        a = net.apply(params, x)
        b = net.clone(fused_tail=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_drf_sisr_fused_tail_equivalent(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 1)).astype(np.float32))
    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                     num_features=4, num_groups=1, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), x)
    with jax.default_matmul_precision("float32"):
        a = net.apply(params, x)
        b = net.clone(fused_tail=True).apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_edvr_fused_tail_equivalent(rng):
    """EDVR's two tail convs chain FOLDED at half resolution; outputs match
    the unfolded graph on one parameter set."""
    from vsr_tpu.models import EDVRNet

    x = jnp.asarray(rng.random((1, 5, 12, 12, 1)).astype(np.float32))
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                  front_RBs=1, back_RBs=1)
    params = net.init(jax.random.PRNGKey(0), x)
    with jax.default_matmul_precision("float32"):
        a = net.apply(params, x)
        b = net.clone(fused_tail=True).apply(params, x)
    assert a.shape == (1, 48, 48, 1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
