"""Halo-exchange spatial sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.parallel.mesh import make_mesh
from vsr_tpu.parallel.spatial import make_spatial_conv


def _same_conv(x, k):
    kh, kw = k.shape[0], k.shape[1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("n_spatial", [2, 4, 8])
def test_sharded_conv_matches_unsharded(rng, n_spatial):
    mesh = make_mesh({"spatial": n_spatial})
    x = jnp.asarray(rng.random((2, 32, 16, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)
    fn = make_spatial_conv(mesh, n_layers=1)
    out = fn(x, [k])
    golden = _same_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), atol=1e-5)


def test_fused_halo_two_layers(rng):
    mesh = make_mesh({"spatial": 4})
    x = jnp.asarray(rng.random((1, 32, 8, 3)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 6)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 6, 3)) * 0.1, jnp.float32)
    fn = make_spatial_conv(mesh, n_layers=2)
    out = fn(x, [k1, k2])
    golden = _same_conv(jax.nn.relu(_same_conv(x, k1)), k2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), atol=1e-5)


def test_5x5_kernel(rng):
    mesh = make_mesh({"spatial": 4})
    x = jnp.asarray(rng.random((1, 32, 8, 2)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 5, 2, 2)) * 0.1, jnp.float32)
    fn = make_spatial_conv(mesh)
    out = fn(x, [k])
    golden = _same_conv(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(golden), atol=1e-5)
