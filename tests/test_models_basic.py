import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models import Bicubic, EDSRNet, count_params
from vsr_tpu.registry import get_class


def test_bicubic_matches_torch_upsample(rng):
    import torch

    x = rng.random((1, 8, 8, 1)).astype(np.float32)
    net = Bicubic(upscale_factor=2)
    out = net.apply({}, jnp.asarray(x))
    golden = (
        torch.nn.Upsample(scale_factor=2, mode="bicubic", align_corners=True)(
            torch.from_numpy(x.transpose(0, 3, 1, 2)).double()
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(np.asarray(out), golden, atol=1e-4)


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_edsr_shapes(factor):
    net = EDSRNet(
        in_channels=1, out_channels=1, num_resblocks=2, num_features=8,
        upscale_factor=factor,
    )
    x = jnp.zeros((2, 12, 12, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 12 * factor, 12 * factor, 1)


def test_edsr_param_count_matches_torch_formula():
    # head: 1->F 3x3; body: 2 resblocks (2 convs F->F) + conv F->F;
    # tail: conv F->4F + shuffle + conv F->1.
    F_ = 8
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=2, num_features=F_, upscale_factor=2)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    expected = (
        (9 * 1 * F_ + F_)
        + 2 * 2 * (9 * F_ * F_ + F_)
        + (9 * F_ * F_ + F_)
        + (9 * F_ * 4 * F_ + 4 * F_)
        + (9 * F_ * 1 + 1)  # shuffle reduces 4F -> F before the last conv
    )
    assert count_params(params) == expected


def test_edsr_jit_and_grad():
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1, num_features=4, upscale_factor=2)
    x = jnp.ones((1, 8, 8, 1))
    y = jnp.ones((1, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss_fn(p):
        return jnp.mean((net.apply(p, x) - y) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_registry_has_nets():
    assert get_class("net", "EDSRNet") is EDSRNet
    assert get_class("net", "Bicubic") is Bicubic
