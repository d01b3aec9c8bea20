import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.models.duf import DUFNet
from vsr_tpu.ops.dynamic_filter import apply_dynamic_filters, extract_patches


def test_extract_patches_matches_manual(rng):
    x = jnp.asarray(rng.random((1, 6, 7, 2)), jnp.float32)
    patches = np.asarray(extract_patches(x, 3))  # (1, 6, 7, 2, 9)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    for y in range(6):
        for xx in range(7):
            for c in range(2):
                manual = xp[0, y : y + 3, xx : xx + 3, c].ravel()
                np.testing.assert_allclose(patches[0, y, xx, c], manual, atol=1e-6)


def test_dynamic_filter_identity(rng):
    """A one-hot filter at the center tap with uniform sub-pixel replication
    reproduces nearest-neighbor upsampling of the input."""
    x = jnp.asarray(rng.random((1, 4, 4, 1)), jnp.float32)
    k2, r = 9, 2
    filters = np.zeros((1, 4, 4, k2, r * r), np.float32)
    filters[:, :, :, 4, :] = 1.0  # center tap for every sub-pixel
    out = np.asarray(apply_dynamic_filters(x, jnp.asarray(filters), r))
    expected = np.repeat(np.repeat(np.asarray(x), r, axis=1), r, axis=2)
    np.testing.assert_allclose(out, expected, atol=1e-6)


@pytest.mark.parametrize("backbone,t_required", [("_DenseLayer16", 7)])
def test_duf_shapes(backbone, t_required):
    net = DUFNet(in_channels=1, out_channels=1, num_frames=t_required,
                 size_filter=5, upscale_factor=2, backbone=backbone)
    x = jnp.zeros((1, t_required, 8, 8, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 1)
    assert "batch_stats" in variables


def test_duf_grad():
    net = DUFNet(in_channels=1, out_channels=1, num_frames=7, size_filter=3,
                 upscale_factor=2, backbone="_DenseLayer16")
    x = jnp.ones((1, 7, 6, 6, 1))
    y = jnp.ones((1, 12, 12, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    def loss(p):
        out, _ = net.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - y) ** 2)

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_duf_filters_sum_to_one_effect(rng):
    """Softmaxed dynamic filters sum to 1 over taps, so a CONSTANT input's
    interior is preserved exactly by the filter branch regardless of the
    filter values (padding only affects a size_filter//2 border)."""
    from vsr_tpu.ops.dynamic_filter import apply_dynamic_filters

    k, r, h = 3, 2, 8
    const = jnp.full((2, h, h, 1), 3.25, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((2, h, h, k * k, r * r)),
                         jnp.float32)
    filters = jax.nn.softmax(logits, axis=3)
    out = np.asarray(apply_dynamic_filters(const, filters, r))
    assert out.shape == (2, h * r, h * r, 1)
    interior = out[:, r : -r * (k // 2) - r, r : -r * (k // 2) - r]
    np.testing.assert_allclose(interior, 3.25, rtol=1e-5)

    # And the full DUF forward on constant input stays finite.
    net = DUFNet(in_channels=1, out_channels=1, num_frames=7, size_filter=3,
                 upscale_factor=2, backbone="_DenseLayer16")
    cseq = jnp.full((1, 7, h, h, 1), 3.25, jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), cseq, train=False)
    assert np.isfinite(np.asarray(net.apply(variables, cseq, train=False))).all()
