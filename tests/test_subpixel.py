"""Exact sub-pixel ConvTranspose decomposition (ops/subpixel.py) and the
net-level ``subpixel_deconv`` serving flag: identical params, identical
results (float round-off) to the lhs-dilated ConvTranspose path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from vsr_tpu.ops.subpixel import conv_transpose_subpixel


@pytest.mark.parametrize("k,s,p", [(6, 2, 2), (7, 3, 2), (8, 4, 2),
                                   (4, 2, 1), (12, 8, 2)])
def test_matches_conv_transpose(rng, k, s, p):
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 3, 5)), jnp.float32)
    ref = lax.conv_transpose(x, w, (s, s), [(k - 1 - p, k - 1 - p)] * 2,
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_transpose_subpixel(x, w, None, s, p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bias_applied(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((6, 6, 2, 3)), jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0])
    got = conv_transpose_subpixel(x, w, b, 2, 2)
    base = conv_transpose_subpixel(x, w, None, 2, 2)
    np.testing.assert_allclose(np.asarray(got - base),
                               np.broadcast_to(np.asarray(b), got.shape),
                               rtol=1e-6)


@pytest.mark.parametrize("make", [
    lambda sp: ("SRFBNet", dict(in_channels=1, out_channels=1, num_steps=2,
                                num_features=8, num_groups=2,
                                upscale_factor=2, subpixel_deconv=sp),
                (1, 12, 12, 1)),
    lambda sp: ("DRFSISRNet", dict(in_channels=1, out_channels=1,
                                   num_steps=2, num_features=8, num_groups=2,
                                   upscale_factor=3, subpixel_deconv=sp),
                (1, 8, 8, 1)),
    lambda sp: ("DRFNet", dict(in_channels=1, out_channels=1, num_features=8,
                               num_groups=2, upscale_factor=2,
                               subpixel_deconv=sp), (1, 3, 8, 8, 1)),
    lambda sp: ("RBPNet", dict(in_channels=1, out_channels=1, base_filter=8,
                               feat=8, num_stages=3, num_resblocks=2,
                               num_frames=3, upscale_factor=2,
                               subpixel_deconv=sp), (1, 3, 8, 8, 1)),
])
def test_net_flag_same_params_same_output(rng, make):
    from vsr_tpu import models

    name, kw_off, shape = make(False)
    _, kw_on, _ = make(True)
    net_off = getattr(models, name)(**kw_off)
    net_on = getattr(models, name)(**kw_on)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    params = net_off.init(jax.random.PRNGKey(3), x)
    # Same params restore into the flag-on net (identical tree paths).
    out_off = net_off.apply(params, x)
    out_on = net_on.apply(params, x)
    a, b = np.asarray(out_off), np.asarray(out_on)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    assert np.abs(a).max() > 1e-3  # non-degenerate
