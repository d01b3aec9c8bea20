import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsr_tpu.ops.deform_conv import deform_conv2d


def naive_deform_conv(x, offsets, weight, mask=None, padding=1):
    """Direct loop implementation of the deformable conv definition (the
    computation the reference CUDA kernels perform), for golden comparison."""
    n, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    _, ho, wo, dg, k2, _ = offsets.shape
    cg = c // dg
    out = np.zeros((n, ho, wo, cout))

    def sample(b, yy, xx, ch):
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        val = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    wy = 1 - abs(yy - yi)
                    wx = 1 - abs(xx - xi)
                    val += x[b, yi, xi, ch] * wy * wx
        return val

    for b in range(n):
        for oy in range(ho):
            for ox in range(wo):
                for ky in range(kh):
                    for kx in range(kw):
                        t = ky * kw + kx
                        for g in range(dg):
                            yy = oy - padding + ky + offsets[b, oy, ox, g, t, 0]
                            xx = ox - padding + kx + offsets[b, oy, ox, g, t, 1]
                            m = mask[b, oy, ox, g, t] if mask is not None else 1.0
                            for ci in range(g * cg, (g + 1) * cg):
                                v = sample(b, yy, xx, ci) * m
                                out[b, oy, ox] += v * weight[ky, kx, ci]
    return out


def test_zero_offset_equals_standard_conv(rng):
    x = jnp.asarray(rng.random((1, 6, 6, 4)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    offsets = jnp.zeros((1, 6, 6, 2, 9, 2), jnp.float32)
    ours = deform_conv2d(x, offsets, weight)
    golden = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-4)


def test_matches_naive_with_offsets(rng):
    x = rng.random((1, 5, 5, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 3)).astype(np.float32)
    offsets = (rng.random((1, 5, 5, 2, 9, 2)).astype(np.float32) - 0.5) * 2
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)))
    golden = naive_deform_conv(x, offsets, weight)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_modulated_matches_naive(rng):
    x = rng.random((1, 4, 4, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 2)).astype(np.float32)
    offsets = (rng.random((1, 4, 4, 1, 9, 2)).astype(np.float32) - 0.5) * 2
    mask = rng.random((1, 4, 4, 1, 9)).astype(np.float32)
    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
                      mask=jnp.asarray(mask))
    )
    golden = naive_deform_conv(x, offsets, weight, mask=mask)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_bias_added(rng):
    x = jnp.asarray(rng.random((1, 4, 4, 2)), jnp.float32)
    weight = jnp.zeros((3, 3, 2, 2), jnp.float32)
    bias = jnp.asarray([1.5, -2.0])
    offsets = jnp.zeros((1, 4, 4, 1, 9, 2), jnp.float32)
    out = np.asarray(deform_conv2d(x, offsets, weight, bias=bias))
    np.testing.assert_allclose(out[..., 0], 1.5, atol=1e-6)
    np.testing.assert_allclose(out[..., 1], -2.0, atol=1e-6)


def test_grad_flows_to_offsets(rng):
    x = jnp.asarray(rng.random((1, 5, 5, 2)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 2, 2)), jnp.float32)
    offsets = jnp.full((1, 5, 5, 1, 9, 2), 0.3, jnp.float32)

    def loss(off):
        return jnp.sum(deform_conv2d(x, off, weight) ** 2)

    g = jax.grad(loss)(offsets)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
