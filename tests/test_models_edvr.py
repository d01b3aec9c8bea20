import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models.edvr import (
    EDVRNet,
    ModulatedDeformConvPack,
    PCDAlign,
    TSAFusion,
)


def test_edvr_shapes():
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
                  front_RBs=1, back_RBs=1)
    x = jnp.zeros((1, 3, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 32, 32, 1)  # x4 like the reference


def test_edvr_pads_non4():
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
                  front_RBs=1, back_RBs=1)
    x = jnp.zeros((1, 3, 10, 14, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 40, 56, 1)


def test_edvr_predeblur_and_no_tsa():
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
                  front_RBs=1, back_RBs=1, predeblur=True, w_TSA=False)
    x = jnp.zeros((1, 3, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 32, 32, 1)


def test_dcn_pack_zero_init_is_half_identity_conv(rng):
    """Zero-init offset conv -> offsets 0, mask sigmoid(0)=0.5: the pack at
    init equals 0.5x a standard conv with its weight."""
    x = jnp.asarray(rng.random((1, 6, 6, 4)), jnp.float32)
    pack = ModulatedDeformConvPack(features=4, deformable_groups=2)
    variables = pack.init(jax.random.PRNGKey(0), x, x)
    out = pack.apply(variables, x, x)
    weight = variables["params"]["weight"]
    bias = variables["params"]["bias"]
    golden = 0.5 * jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), atol=1e-4)


def test_pcd_align_shapes(rng):
    pcd = PCDAlign(nf=8, groups=2)
    l1 = jnp.asarray(rng.random((1, 8, 8, 8)), jnp.float32)
    l2 = jnp.asarray(rng.random((1, 4, 4, 8)), jnp.float32)
    l3 = jnp.asarray(rng.random((1, 2, 2, 8)), jnp.float32)
    params = pcd.init(jax.random.PRNGKey(0), [l1, l2, l3], [l1, l2, l3])
    out = pcd.apply(params, [l1, l2, l3], [l1, l2, l3])
    assert out.shape == (1, 8, 8, 8)


def test_tsa_fusion_shapes(rng):
    tsa = TSAFusion(nf=8, nframes=3, center=1)
    aligned = jnp.asarray(rng.random((2, 3, 8, 8, 8)), jnp.float32)
    params = tsa.init(jax.random.PRNGKey(0), aligned)
    out = tsa.apply(params, aligned)
    assert out.shape == (2, 8, 8, 8)


def test_edvr_grad():
    net = EDVRNet(in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
                  front_RBs=1, back_RBs=1)
    x = jnp.ones((1, 3, 8, 8, 1))
    y = jnp.ones((1, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((net.apply(p, x) - y) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
