import numpy as np
import pytest

from vsr_tpu.preprocess.kspace import (
    kspace_downscale,
    kspace_downscale_jax,
    kspace_lowpass,
    kspace_truncation_mask,
)


def reference_downscale(img: np.ndarray, factor: int) -> np.ndarray:
    """The reference algorithm (acdc_preprocess.py:102-180) restated
    directly from its mathematical definition, as an independent check of
    the FFT/mask conventions (bicubic step checked separately vs torch)."""
    from numpy.fft import fftn, fftshift, ifftn, ifftshift

    k = fftshift(fftn(ifftshift(img), norm="ortho"))
    rect = np.zeros_like(k)
    kx, ky = img.shape[0] // 2, img.shape[1] // 2
    lx, ly = img.shape[0] // factor, img.shape[1] // factor
    rect[kx - lx // 2 : kx + (lx - lx // 2), ky - ly // 2 : ky + (ly - ly // 2)] = 1
    low = fftshift(ifftn(ifftshift(rect * k), norm="ortho"))
    return np.around(np.abs(low))


@pytest.mark.parametrize("factor", [2, 3, 4])
@pytest.mark.parametrize("shape", [(48, 48, 1), (36, 24, 1), (60, 36, 1)])
def test_lowpass_matches_reference_definition(rng, factor, shape):
    img = np.round(rng.random(shape) * 255)
    ours = kspace_lowpass(img, factor)
    golden = reference_downscale(img, factor)
    np.testing.assert_array_equal(ours, golden)


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_mask_extent(factor):
    mask = kspace_truncation_mask(48, 36, factor)
    assert mask.sum() == (48 // factor) * (36 // factor)
    # Central rectangle: DC bin (H//2, W//2) always passes.
    assert mask[24, 18] == 1.0


def test_downscale_output_range_and_shape(rng):
    img = np.round(rng.random((48, 48, 1)) * 255)
    lr = kspace_downscale(img, 2)
    assert lr.shape == (24, 24, 1)
    assert lr.min() >= 0 and lr.max() <= 255
    assert np.array_equal(lr, np.round(lr))


def test_constant_image_preserved():
    img = np.full((24, 24, 1), 128.0)
    lr = kspace_downscale(img, 2)
    np.testing.assert_allclose(lr, 128.0, atol=1.0)


@pytest.mark.parametrize("factor", [2, 4])
def test_jax_matches_numpy_within_rounding(rng, factor):
    import jax

    imgs = np.round(rng.random((2, 48, 48)) * 255).astype(np.float32)
    jax_out = np.asarray(jax.jit(lambda x: kspace_downscale_jax(x, factor))(imgs))
    for i in range(2):
        np_out = kspace_downscale(imgs[i][..., None], factor)[..., 0]
        # The round-4 real-split chain measures 100% exact vs the float64
        # numpy reference at every protocol probed (48^2 and 192^2, the
        # old complex64 chain was ~98-99.5% / +-1 grey). Enforce a
        # slightly looser bound so a legitimate .5-boundary flip on a new
        # platform doesn't flake: >=99.9% exact, <=1 grey elsewhere.
        diff = np.abs(jax_out[i] - np_out)
        assert (diff == 0).mean() >= 0.999, f"match rate {(diff == 0).mean()}"
        assert diff.max() <= 1.0
