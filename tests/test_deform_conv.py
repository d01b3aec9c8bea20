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


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_zero_offset_equals_standard_conv(rng, method):
    x = jnp.asarray(rng.random((1, 6, 6, 4)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 4, 5)), jnp.float32)
    offsets = jnp.zeros((1, 6, 6, 2, 9, 2), jnp.float32)
    ours = deform_conv2d(x, offsets, weight, method=method)
    golden = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(golden), atol=1e-4)


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_matches_naive_with_offsets(rng, method):
    x = rng.random((1, 5, 5, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 3)).astype(np.float32)
    offsets = (rng.random((1, 5, 5, 2, 9, 2)).astype(np.float32) - 0.5) * 2
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets),
                                    jnp.asarray(weight), method=method))
    golden = naive_deform_conv(x, offsets, weight)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_modulated_matches_naive(rng, method):
    x = rng.random((1, 4, 4, 2)).astype(np.float32)
    weight = rng.standard_normal((3, 3, 2, 2)).astype(np.float32)
    offsets = (rng.random((1, 4, 4, 1, 9, 2)).astype(np.float32) - 0.5) * 2
    mask = rng.random((1, 4, 4, 1, 9)).astype(np.float32)
    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
                      mask=jnp.asarray(mask), method=method)
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


@pytest.mark.parametrize("method", ["gather", "matmul"])
def test_grad_flows_to_offsets(rng, method):
    x = jnp.asarray(rng.random((1, 5, 5, 2)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 2, 2)), jnp.float32)
    offsets = jnp.full((1, 5, 5, 1, 9, 2), 0.3, jnp.float32)

    def loss(off):
        return jnp.sum(deform_conv2d(x, off, weight, method=method) ** 2)

    g = jax.grad(loss)(offsets)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_matmul_and_gather_paths_agree(rng):
    """The hat-matmul sampler and the 4-corner gather sampler are the same
    math — outputs, input grads, and offset grads agree on a larger random
    case with out-of-bounds samples, stride 2, dilation 2, groups."""
    x = jnp.asarray(rng.random((2, 9, 7, 4)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 4, 5)) * 0.3, jnp.float32)
    offsets = jnp.asarray((rng.random((2, 5, 4, 2, 9, 2)) - 0.5) * 8,
                          jnp.float32)
    mask = jnp.asarray(rng.random((2, 5, 4, 2, 9)), jnp.float32)

    def f(method):
        def loss(x_, off_):
            out = deform_conv2d(x_, off_, weight, mask=mask, stride=2,
                                padding=2, dilation=2, method=method)
            return jnp.sum(out ** 2), out

        (l, out), (gx, go) = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(x, offsets)
        return out, gx, go

    out_g, gx_g, go_g = f("gather")
    out_m, gx_m, go_m = f("matmul")
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_g),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(go_m), np.asarray(go_g),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("with_mask", [False, True])
def test_scan_major_layout_agrees(rng, with_mask):
    """The opt-in scan-major contraction (taps consumed as (k2, dg, N, P,
    cg) — a kept 0.88x A/B path) pins the default matmul path's values:
    any refactor of _sample_taps_matmul's tap ordering must keep both
    layouts consistent."""
    x = jnp.asarray(rng.random((2, 7, 6, 4)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, 4, 5)) * 0.3, jnp.float32)
    offsets = jnp.asarray((rng.random((2, 4, 3, 2, 9, 2)) - 0.5) * 6,
                          jnp.float32)
    mask = (jnp.asarray(rng.random((2, 4, 3, 2, 9)), jnp.float32)
            if with_mask else None)
    base = deform_conv2d(x, offsets, weight, mask=mask, stride=2,
                         padding=2, dilation=2)
    sm = deform_conv2d(x, offsets, weight, mask=mask, stride=2,
                       padding=2, dilation=2, scan_major=True)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
