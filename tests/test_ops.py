import numpy as np
import pytest

from vsr_tpu.ops.pixel_shuffle import pixel_shuffle, space_to_depth
from vsr_tpu.ops.upsample import upsample_bicubic, upsample_bilinear
from vsr_tpu.ops.warp import flow_warp, grid_sample_normalized


def test_pixel_shuffle_matches_torch(rng):
    import torch

    x = rng.random((2, 4, 5, 8)).astype(np.float32)  # NHWC, C=8=2*2^2
    ours = np.asarray(pixel_shuffle(x, 2))
    golden = (
        torch.nn.PixelShuffle(2)(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(ours, golden)


def test_space_to_depth_inverse(rng):
    x = rng.random((1, 6, 8, 3)).astype(np.float32)
    packed = space_to_depth(x, 2)
    assert packed.shape == (1, 3, 4, 12)
    np.testing.assert_array_equal(np.asarray(pixel_shuffle(packed, 2)), x)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
def test_upsample_matches_torch(rng, mode, align):
    import torch
    import torch.nn.functional as F

    x = rng.random((1, 8, 10, 1)).astype(np.float32)
    fn = upsample_bicubic if mode == "bicubic" else upsample_bilinear
    ours = np.asarray(fn(x, scale=2, align_corners=align))
    golden = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)).double(),
            scale_factor=2, mode=mode, align_corners=align,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_flow_warp_zero_flow_identity(rng):
    img = rng.random((1, 6, 7, 2)).astype(np.float32)
    flow = np.zeros((1, 6, 7, 2), np.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(img, flow)), img, atol=1e-6)


def test_flow_warp_integer_shift(rng):
    img = rng.random((1, 8, 8, 1)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample from x+1
    out = np.asarray(flow_warp(img, flow))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0], atol=1e-6)
    # zeros padding at the right edge
    np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-6)


def test_flow_warp_matches_torch_grid_sample(rng):
    import torch
    import torch.nn.functional as F

    img = rng.random((2, 9, 11, 3)).astype(np.float32)
    flow = (rng.random((2, 9, 11, 2)).astype(np.float32) - 0.5) * 4
    ours = np.asarray(flow_warp(img, flow))

    t_img = torch.from_numpy(img.transpose(0, 3, 1, 2)).double()
    h, w = 9, 11
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = (xs[None] + flow[..., 0]) / max(w - 1, 1) * 2 - 1
    gy = (ys[None] + flow[..., 1]) / max(h - 1, 1) * 2 - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1)).double()
    golden = (
        F.grid_sample(t_img, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_grid_sample_normalized_corners(rng):
    img = rng.random((1, 5, 5, 1)).astype(np.float32)
    grid = np.zeros((1, 2, 2, 2), np.float32)
    grid[0, 0, 0] = [-1, -1]  # top-left
    grid[0, 0, 1] = [1, -1]   # top-right
    grid[0, 1, 0] = [-1, 1]   # bottom-left
    grid[0, 1, 1] = [1, 1]    # bottom-right
    out = np.asarray(grid_sample_normalized(img, grid))
    np.testing.assert_allclose(out[0, 0, 0, 0], img[0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 0, 1, 0], img[0, 0, 4, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 0, 0], img[0, 4, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 1, 0], img[0, 4, 4, 0], atol=1e-6)


def test_warp_matmul_and_gather_agree(rng):
    """Hat-matmul sampler vs 4-corner gather sampler: values and grid grads
    agree for both padding modes, incl. far out-of-bounds coordinates."""
    import jax
    import jax.numpy as jnp

    from vsr_tpu.ops.warp import grid_sample_bilinear

    img = jnp.asarray(rng.random((2, 9, 7, 3)), jnp.float32)
    gy = jnp.asarray((rng.random((2, 5, 6)) - 0.3) * 12, jnp.float32)
    gx = jnp.asarray((rng.random((2, 5, 6)) - 0.3) * 10, jnp.float32)

    for mode in ("zeros", "border"):
        def f(method, g):
            out = grid_sample_bilinear(img, g, gx, padding_mode=mode,
                                       method=method)
            return jnp.sum(out ** 2), out

        (_, out_g), gg = jax.value_and_grad(
            lambda g: f("gather", g), has_aux=True)(gy)
        (_, out_m), gm = jax.value_and_grad(
            lambda g: f("matmul", g), has_aux=True)(gy)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gg),
                                   rtol=1e-4, atol=1e-4)


def test_warp_border_exact_boundary_gradient(rng):
    """At coordinates exactly on the border (border padding), both corners
    clamp to the same pixel so the torch/gather coordinate gradient is 0;
    the matmul path must agree (regression: hat'(0) = -1 leaked -img[h-1])."""
    import jax
    import jax.numpy as jnp

    from vsr_tpu.ops.warp import grid_sample_bilinear

    img = jnp.asarray(rng.random((1, 5, 4, 2)), jnp.float32)
    # Corners and edges: exactly 0 and exactly h-1 / w-1, plus interior ints.
    gy = jnp.asarray([[[0.0, 4.0], [4.0, 2.0]]], jnp.float32)
    gx = jnp.asarray([[[0.0, 3.0], [1.5, 3.0]]], jnp.float32)

    def loss(method, g):
        return jnp.sum(grid_sample_bilinear(img, g, gx, padding_mode="border",
                                            method=method) ** 2)

    for wrt in ("gy", "gx"):
        def f(method, v):
            if wrt == "gy":
                return loss(method, v)
            return jnp.sum(grid_sample_bilinear(
                img, gy, v, padding_mode="border", method=method) ** 2)

        var = gy if wrt == "gy" else gx
        g_gather = jax.grad(lambda v: f("gather", v))(var)
        g_matmul = jax.grad(lambda v: f("matmul", v))(var)
        np.testing.assert_allclose(np.asarray(g_matmul), np.asarray(g_gather),
                                   rtol=1e-5, atol=1e-5)


def test_warp_transposed_lane_layout_agrees(rng):
    """Narrow-lane shapes (W*C <= 256, P >= 4*W*C) take the transposed MXU
    layout inside hat_sample_chunk (lanes = P instead of W*C, 1.35x on the
    FRVSR HR warp). Values, grid grads, and image grads must match the
    gather oracle exactly like the baseline layout does."""
    import jax
    import jax.numpy as jnp

    from vsr_tpu.ops.warp import grid_sample_bilinear

    # w*c = 12 <= 256 and P = ho*wo = 192 >= 48: transposed path active.
    img = jnp.asarray(rng.random((2, 16, 12, 1)), jnp.float32)
    gy = jnp.asarray((rng.random((2, 12, 16)) - 0.3) * 20, jnp.float32)
    gx = jnp.asarray((rng.random((2, 12, 16)) - 0.3) * 16, jnp.float32)

    for mode in ("zeros", "border"):
        def out_of(method, im, g):
            return grid_sample_bilinear(im, g, gx, padding_mode=mode,
                                        method=method)

        out_g = out_of("gather", img, gy)
        out_m = out_of("matmul", img, gy)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_g),
                                   rtol=1e-5, atol=1e-5)
        for argnum, operand in ((0, "img"), (1, "grid")):
            gg = jax.grad(lambda im, g: jnp.sum(out_of("gather", im, g) ** 2),
                          argnums=argnum)(img, gy)
            gm = jax.grad(lambda im, g: jnp.sum(out_of("matmul", im, g) ** 2),
                          argnums=argnum)(img, gy)
            np.testing.assert_allclose(
                np.asarray(gm), np.asarray(gg), rtol=1e-4, atol=1e-4,
                err_msg=f"{mode}/{operand}")
