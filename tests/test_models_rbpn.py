import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models.rbpn import DBPNet, RBPNet


@pytest.mark.parametrize("factor", [2, 4])
def test_rbpn_shapes(factor):
    net = RBPNet(in_channels=1, out_channels=1, base_filter=8, feat=8,
                 num_stages=3, num_resblocks=1, num_frames=3, upscale_factor=factor)
    x = jnp.zeros((1, 3, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 8 * factor, 8 * factor, 1)


def test_dbpnet_upscales():
    net = DBPNet(feat=8, num_stages=3, upscale_factor=2)
    x = jnp.zeros((1, 8, 8, 8))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 16, 16, 8)


def test_rbpn_neighbor_count_affects_recon_input():
    # Reconstruction conv input = (num_frames-1)*feat; params must differ.
    def n_params(frames):
        from vsr_tpu.models.common import count_params

        net = RBPNet(in_channels=1, out_channels=1, base_filter=8, feat=8,
                     num_stages=3, num_resblocks=1, num_frames=frames,
                     upscale_factor=2)
        return count_params(net.init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, frames, 8, 8, 1))))

    assert n_params(5) > n_params(3)


def test_rbpn_grad():
    net = RBPNet(in_channels=1, out_channels=1, base_filter=8, feat=8,
                 num_stages=3, num_resblocks=1, num_frames=3, upscale_factor=2)
    x = jnp.ones((1, 3, 6, 6, 1))
    y = jnp.ones((1, 12, 12, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((net.apply(p, x) - y) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
