import numpy as np
import pytest

from vsr_tpu.data.transforms import (
    Compose,
    Normalize,
    RandomCrop,
    RandomCropPatch,
    RandomElasticDeformation,
    RandomHorizontalFlip,
    RandomVerticalFlip,
    Resize,
    ToTensor,
    compose,
)


def test_compose_from_config():
    specs = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    pipeline = compose(specs)
    assert isinstance(pipeline, Compose)
    img = np.full((8, 8, 1), 54.089, dtype=np.float32)
    out = pipeline(img)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_compose_default_totensor():
    out = compose(None)(np.zeros((4, 4, 1), np.int16))
    assert out.dtype == np.float32


def test_totensor_dtypes():
    a, b = np.zeros((4, 4, 1)), np.zeros((4, 4, 1))
    out = ToTensor()(a, b, dtypes=[np.float32, np.int32])
    assert out[0].dtype == np.float32 and out[1].dtype == np.int32


def test_normalize_image_level(rng):
    img = (rng.random((16, 16, 2)) * 100).astype(np.float32)
    (out,) = Normalize()(img)
    for c in range(2):
        assert abs(out[..., c].mean()) < 1e-4
        assert abs(out[..., c].std() - 1.0) < 1e-3


def test_normalize_tags(rng):
    img = (rng.random((8, 8, 1)) * 100).astype(np.float32)
    lab = img.copy()
    out_img, out_lab = Normalize()(img, lab, normalize_tags=[True, False])
    np.testing.assert_array_equal(out_lab, lab)
    assert not np.allclose(out_img, img)


def test_normalize_mismatched_stats():
    with pytest.raises(ValueError):
        Normalize(means=[1.0], stds=None)


def test_random_crop_2d_3d(rng):
    gen = np.random.default_rng(0)
    img2 = rng.random((20, 18, 1))
    (out2,) = RandomCrop([8, 6])(img2, rng=gen)
    assert out2.shape == (8, 6, 1)
    img3 = rng.random((20, 18, 10, 1))
    (out3,) = RandomCrop([8, 6, 4])(img3, rng=gen)
    assert out3.shape == (8, 6, 4, 1)


def test_random_crop_too_small(rng):
    with pytest.raises(ValueError):
        RandomCrop([30, 30])(rng.random((20, 18, 1)), rng=np.random.default_rng(0))


def test_flips_involution(rng):
    img = rng.random((12, 10, 1))
    gen = np.random.default_rng(1)
    (flipped,) = RandomHorizontalFlip(prob=1.0)(img, rng=gen)
    (restored,) = RandomHorizontalFlip(prob=1.0)(flipped, rng=gen)
    np.testing.assert_array_equal(restored, img)
    np.testing.assert_array_equal(flipped, img[:, ::-1])
    (vflipped,) = RandomVerticalFlip(prob=1.0)(img, rng=gen)
    np.testing.assert_array_equal(vflipped, img[::-1])


def test_flip_prob_zero(rng):
    img = rng.random((6, 6, 1))
    (out,) = RandomHorizontalFlip(prob=0.0)(img, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out, img)


def test_random_crop_patch_2d(rng):
    ratio = 2
    lr = np.arange(16 * 16).reshape(16, 16, 1).astype(np.float32)
    hr = np.kron(lr[..., 0], np.ones((ratio, ratio)))[..., None].astype(np.float32)
    gen = np.random.default_rng(2)
    lr_c, hr_c = RandomCropPatch([8, 8], ratio)(lr, hr, rng=gen)
    assert lr_c.shape == (8, 8, 1) and hr_c.shape == (16, 16, 1)
    # HR crop is the upscaled LR crop location: check alignment.
    np.testing.assert_array_equal(hr_c[::ratio, ::ratio, 0], lr_c[..., 0])


def test_random_crop_patch_4d_depth_unscaled(rng):
    ratio = 2
    # The reference's ratio check spans all spatial dims incl. depth, yet the
    # depth *coordinates* of the HR crop are taken unscaled from the LR crop
    # (transforms.py:419-423) — both quirks preserved.
    lr = rng.random((12, 12, 6, 1)).astype(np.float32)
    hr = rng.random((24, 24, 12, 1)).astype(np.float32)
    gen = np.random.default_rng(3)
    lr_c, hr_c = RandomCropPatch([6, 6, 4], ratio)(lr, hr, rng=gen)
    assert lr_c.shape == (6, 6, 4, 1)
    assert hr_c.shape == (12, 12, 4, 1)  # depth extent NOT scaled


def test_random_crop_patch_bad_ratio(rng):
    with pytest.raises(ValueError):
        RandomCropPatch([4, 4], 2)(
            rng.random((8, 8, 1)), rng.random((8, 8, 1)), rng=np.random.default_rng(0)
        )


def test_elastic_deformation_applies(rng):
    img = rng.random((32, 32, 1)).astype(np.float32)
    gen = np.random.default_rng(4)
    (out,) = RandomElasticDeformation(prob=1.0, sigma=3)(img, rng=gen)
    assert out.shape == img.shape
    assert not np.allclose(out, img)


def test_elastic_deformation_prob_zero(rng):
    img = rng.random((16, 16, 1)).astype(np.float32)
    out = RandomElasticDeformation(prob=0.0)(img, rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out[0], img)


def test_resize_transform(rng):
    img = rng.random((16, 16, 1)).astype(np.float32)
    (out,) = Resize([8, 8])(img)
    assert out.shape == (8, 8, 1)


def test_deterministic_given_same_rng(rng):
    img = rng.random((20, 20, 1))
    t = Compose([RandomCrop([8, 8]), RandomHorizontalFlip()])
    out1 = t(img, rng=np.random.default_rng(42))
    out2 = t(img, rng=np.random.default_rng(42))
    np.testing.assert_array_equal(out1, out2)
