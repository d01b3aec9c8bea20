import jax
import jax.numpy as jnp
import numpy as np

from vsr_tpu.models import DRFNet, FRVSRNet


def _grads(net, x, y):
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = net.apply(p, x)
        if isinstance(out, tuple):
            out = out[0]
        return jnp.mean((out - y) ** 2)

    return jax.grad(loss)(params)


def test_drfnet_remat_matches_plain():
    kw = dict(in_channels=1, out_channels=1, num_features=4, num_groups=1,
              upscale_factor=2)
    x = jnp.asarray(np.random.default_rng(0).random((1, 4, 6, 6, 1)), jnp.float32)
    y = jnp.ones((1, 4, 12, 12, 1))
    g_plain = _grads(DRFNet(**kw), x, y)
    g_remat = _grads(DRFNet(**kw, remat=True), x, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_frvsr_remat_matches_plain():
    kw = dict(in_channels=1, out_channels=1, upscale_factor=2, num_resblocks=1)
    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 8, 8, 1)), jnp.float32)
    y = jnp.ones((1, 3, 16, 16, 1))
    g_plain = _grads(FRVSRNet(**kw), x, y)
    g_remat = _grads(FRVSRNet(**kw, remat=True), x, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
