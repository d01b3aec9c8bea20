"""Pallas fused concat+1x1 squeeze (ops/fused_squeeze.py) and the FBlock
``fused_squeeze`` flag: same params, same outputs (and gradients) as the
materialized-concat path. On CPU the kernel runs in interpreter mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.ops.fused_squeeze import concat_matmul


def test_concat_matmul_matches_reference(rng):
    xs = tuple(jnp.asarray(rng.standard_normal((2, 5, 7, c)), jnp.float32)
               for c in (64, 64, 32))
    w = jnp.asarray(rng.standard_normal((160, 48)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(48), jnp.float32)
    ref = jnp.concatenate(xs, -1) @ w + b
    got = concat_matmul(xs, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_concat_matmul_grads(rng):
    xs = tuple(jnp.asarray(rng.standard_normal((2, 4, 4, c)), jnp.float32)
               for c in (16, 8))
    w = jnp.asarray(rng.standard_normal((24, 12)) * 0.1, jnp.float32)
    b = jnp.zeros((12,), jnp.float32)

    def loss_ref(xs, w, b):
        return jnp.sum(jnp.tanh(jnp.concatenate(xs, -1) @ w + b))

    def loss_new(xs, w, b):
        return jnp.sum(jnp.tanh(concat_matmul(xs, w, b)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(xs, w, b)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(xs, w, b)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,kw,shape", [
    ("SRFBNet", dict(in_channels=1, out_channels=1, num_steps=2,
                     num_features=8, num_groups=3, upscale_factor=2),
     (1, 12, 12, 1)),
    ("DRFSISRNet", dict(in_channels=1, out_channels=1, num_steps=2,
                        num_features=8, num_groups=2, upscale_factor=2),
     (1, 8, 8, 1)),
    ("DRFNet", dict(in_channels=1, out_channels=1, num_features=8,
                    num_groups=2, upscale_factor=2), (1, 3, 8, 8, 1)),
])
def test_net_fused_squeeze_same_params_same_output(rng, name, kw, shape):
    from vsr_tpu import models

    net_off = getattr(models, name)(**kw)
    net_on = getattr(models, name)(**kw, fused_squeeze=True)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    params = net_off.init(jax.random.PRNGKey(5), x)
    # Param trees must be identical so checkpoints interchange.
    p2 = net_on.init(jax.random.PRNGKey(5), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    out_off = np.asarray(net_off.apply(params, x))
    out_on = np.asarray(net_on.apply(params, x))
    assert out_off.shape == out_on.shape
    np.testing.assert_allclose(out_on, out_off, rtol=2e-4, atol=2e-4)
    assert np.abs(out_off).max() > 1e-3


def test_fused_squeeze_trains(rng):
    """Gradients flow through the fused net (one step reduces the loss)."""
    from vsr_tpu.models import DRFSISRNet

    net = DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                     num_features=8, num_groups=2, upscale_factor=2,
                     fused_squeeze=True)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((net.apply(p, x)[-1] - y) ** 2)

    l0, g = jax.value_and_grad(loss)(params)
    p1 = jax.tree_util.tree_map(lambda a, d: a - 0.05 * d, params, g)
    assert float(loss(p1)) < float(l0)
