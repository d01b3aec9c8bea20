"""Numeric edge cases: odd sizes, factor 3, large ratios, bf16 metrics."""

import numpy as np
import pytest

from vsr_tpu.metrics import PSNR
from vsr_tpu.preprocess.kspace import kspace_downscale, kspace_downscale_jax
from vsr_tpu.preprocess.resize import resize_bicubic


def test_kspace_factor3_jax_matches_numpy(rng):
    imgs = np.round(rng.random((2, 36, 36)) * 255).astype(np.float32)
    import jax

    out = np.asarray(jax.jit(lambda x: kspace_downscale_jax(x, 3))(imgs))
    for i in range(2):
        ref = kspace_downscale(imgs[i][..., None], 3)[..., 0]
        diff = np.abs(out[i] - ref)
        assert (diff == 0).mean() > 0.98 and diff.max() <= 1.0


def test_kspace_odd_size(rng):
    # Sizes not divisible by the factor: output floor-divides like cv2.
    img = np.round(rng.random((25, 27, 1)) * 255)
    lr = kspace_downscale(img, 2)
    assert lr.shape == (12, 13, 1)


def test_resize_extreme_ratios(rng):
    img = rng.random((64, 64)) * 255
    small = resize_bicubic(img, 4, 4)
    assert small.shape == (4, 4)
    big = resize_bicubic(img, 200, 200)
    assert big.shape == (200, 200)
    # Interior values stay within overshoot bounds of the Keys kernel.
    assert big.min() > -60 and big.max() < 320  # Keys-kernel overshoot bounds


def test_psnr_bf16_inputs(rng):
    import jax.numpy as jnp

    out = jnp.asarray(rng.random((1, 8, 8, 1)) * 255, jnp.bfloat16)
    tgt = jnp.asarray(rng.random((1, 8, 8, 1)) * 255, jnp.bfloat16)
    val = float(PSNR()(out.astype(jnp.float32), tgt.astype(jnp.float32)))
    assert np.isfinite(val)


def test_denormalize_roundtrip(rng):
    from vsr_tpu.utils.normalize import DATASET_STATS, denormalize, normalize

    mean, std = DATASET_STATS["dsb15"]
    img = np.round(rng.random((8, 8)) * 255).astype(np.float32)
    z = normalize(img, mean, std)
    back = denormalize(z, "dsb15")
    np.testing.assert_array_equal(back, img)
