import numpy as np
import pytest

from vsr_tpu.preprocess.resize import (
    bicubic_resize_matrix,
    resize_bicubic,
    resize_bicubic_jax,
)


def torch_bicubic(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Independent golden implementation: torch's bicubic with
    align_corners=False uses the same Keys a=-0.75 kernel and pixel-center
    mapping as cv2.INTER_CUBIC."""
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(img.astype(np.float64))[None, None]
    out = F.interpolate(t, size=(out_h, out_w), mode="bicubic", align_corners=False)
    return out[0, 0].numpy()


def test_identity_same_size(rng):
    img = rng.random((17, 13)) * 255
    np.testing.assert_allclose(resize_bicubic(img, 17, 13), img, atol=1e-9)


def test_rows_sum_to_one():
    for in_size, out_size in [(32, 16), (33, 11), (48, 12), (16, 32), (7, 19)]:
        m = bicubic_resize_matrix(in_size, out_size)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-12)


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [((32, 32), (16, 16)), ((36, 24), (12, 8)), ((33, 21), (11, 7)), ((16, 16), (32, 32)), ((20, 30), (49, 13))],
)
def test_matches_torch_bicubic(rng, in_shape, out_shape):
    img = rng.random(in_shape) * 255
    ours = resize_bicubic(img, *out_shape)
    golden = torch_bicubic(img, *out_shape)
    np.testing.assert_allclose(ours, golden, atol=1e-8)


def test_jax_matches_numpy(rng):
    import jax

    img = (rng.random((3, 40, 28)) * 255).astype(np.float32)
    ours = jax.jit(lambda x: resize_bicubic_jax(x, 20, 14))(img)
    for i in range(3):
        ref = resize_bicubic(img[i], 20, 14)
        np.testing.assert_allclose(np.asarray(ours[i]), ref, atol=1e-2)


def test_channels_last_3d(rng):
    img = rng.random((24, 24, 2)) * 255
    out = resize_bicubic(img, 12, 12)
    assert out.shape == (12, 12, 2)
    for c in range(2):
        np.testing.assert_allclose(out[..., c], resize_bicubic(img[..., c], 12, 12), atol=1e-9)
