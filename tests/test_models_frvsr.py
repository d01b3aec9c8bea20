import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import FRVSRNet
from vsr_tpu.models.frvsr import FNet, stn_warp


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_frvsr_shapes(factor):
    net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=factor,
                   num_resblocks=1)
    x = jnp.zeros((1, 3, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    sr, warped_lr = net.apply(params, x)
    assert sr.shape == (1, 3, 8 * factor, 8 * factor, 1)
    assert warped_lr.shape == (1, 3, 8, 8, 1)


def test_frvsr_prediction_mode():
    net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                   is_prediction=True, num_resblocks=1)
    x = jnp.zeros((1, 2, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert not isinstance(out, tuple)
    assert out.shape == (1, 2, 16, 16, 1)


def test_fnet_pads_odd_sizes():
    fnet = FNet()
    a = jnp.zeros((1, 10, 14, 1))  # not /8
    params = fnet.init(jax.random.PRNGKey(0), a, a)
    flow = fnet.apply(params, a, a)
    assert flow.shape == (1, 10, 14, 2)
    assert float(jnp.abs(flow).max()) <= 1.0  # tanh-bounded


def test_stn_warp_zero_flow_identity(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1)), jnp.float32)
    flow = jnp.zeros((1, 8, 8, 2))
    np.testing.assert_allclose(np.asarray(stn_warp(img, flow)), np.asarray(img),
                               atol=1e-6)


def test_stn_warp_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F

    img = rng.random((1, 9, 11, 1)).astype(np.float32)
    flow = (rng.random((1, 9, 11, 2)).astype(np.float32) - 0.5) * 0.4
    ours = np.asarray(stn_warp(jnp.asarray(img), jnp.asarray(flow)))

    ys, xs = np.meshgrid(np.linspace(-1, 1, 9), np.linspace(-1, 1, 11), indexing="ij")
    grid = np.stack([xs[None] + flow[..., 0], ys[None] + flow[..., 1]], axis=-1)
    golden = (
        F.grid_sample(
            torch.from_numpy(img.transpose(0, 3, 1, 2)).double(),
            torch.from_numpy(grid).double(),
            mode="bilinear", padding_mode="border", align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_frvsr_grad_excludes_sr_recurrence_but_trains():
    net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2, num_resblocks=1)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 8, 8, 1)), jnp.float32)
    y = jnp.ones((1, 3, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        sr, warped = net.apply(p, x)
        return jnp.mean((sr - y) ** 2) + jnp.mean((warped - x) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
