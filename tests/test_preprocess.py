import numpy as np
import pytest

from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.preprocess.imageops import (
    binary_close,
    binary_open,
    gaussian_blur5,
    otsu_threshold,
)
from vsr_tpu.preprocess.intensity import (
    RunningMoments,
    center_crop_multiple,
    clip_outliers_minmax,
)
from vsr_tpu.preprocess.cropping import find_bbox
from vsr_tpu.preprocess import acdc as acdc_pre
from vsr_tpu.preprocess.pipeline import PreprocessStats, process_acdc_volume


def test_center_crop_multiple():
    # 100 % 12 = 4 -> trim 2 top, 2 bottom; 99 % 12 = 3 -> 1 top, 2 bottom.
    assert center_crop_multiple((100, 99)) == (2, 98, 1, 97)
    assert center_crop_multiple((96, 48)) == (0, 96, 0, 48)


def test_clip_outliers_int16():
    data = np.zeros((10, 10), dtype=np.int16)
    data[0, 0] = 1000  # single outlier
    data[5, 5] = 100
    out = clip_outliers_minmax(data)
    assert out.dtype == np.float32
    assert out.max() == 255.0 and out.min() == 0.0
    # The outlier must have been clipped to the 99.5% CDF level, so the
    # second-largest value maps to 255 too.
    assert out[0, 0] == 255.0 and out[5, 5] == 255.0


def test_clip_outliers_float_passthrough():
    data = np.linspace(0, 300, 16, dtype=np.float32).reshape(4, 4)
    out = clip_outliers_minmax(data)
    np.testing.assert_array_equal(out, data)


def test_running_moments():
    m = RunningMoments()
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.ones((2, 2), dtype=np.float32)
    m.update(a)
    m.update(b)
    both = np.concatenate([a.ravel(), b.ravel()])
    assert m.mean == pytest.approx(both.mean())
    assert m.std == pytest.approx(both.std())


def test_gaussian_blur5_constant_preserved():
    img = np.full((16, 16), 7.0, dtype=np.float32)
    np.testing.assert_allclose(gaussian_blur5(img), 7.0, atol=1e-6)


def test_gaussian_blur5_kernel_normalized(rng):
    img = (rng.random((32, 32)) * 255).astype(np.float32)
    out = gaussian_blur5(img)
    assert out.shape == img.shape
    # Energy preserved for smooth border handling (mirror), mean close.
    assert abs(out.mean() - img.mean()) < 2.0


def test_otsu_bimodal():
    img = np.concatenate([np.full(500, 20), np.full(500, 200)]).astype(np.uint8)
    t = otsu_threshold(img.reshape(25, 40))
    assert 20 <= t < 200


def test_morphology_close_fills_open_removes():
    mask = np.zeros((20, 20), dtype=np.uint8)
    mask[5:15, 5:15] = 1
    mask[9, 9] = 0  # pinhole -> closed
    closed = binary_close(mask)
    assert closed[9, 9]
    speck = np.zeros((20, 20), dtype=np.uint8)
    speck[3, 3] = 1  # isolated speck -> opened away
    assert not binary_open(speck).any()


def _moving_blob_sequence(h=64, w=64, t=12):
    data = np.zeros((h, w, 1, t), dtype=np.float32)
    yy, xx = np.mgrid[:h, :w]
    for i in range(t):
        cy, cx = h // 2 + int(6 * np.cos(2 * np.pi * i / t)), w // 2
        blob = 250 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 60.0)
        data[..., 0, i] = blob
    return data


def test_find_bbox_centers_on_motion():
    data = _moving_blob_sequence()
    h0, hn, w0, wn = find_bbox(data)
    assert 0 <= h0 < hn <= 64 and 0 <= w0 < wn <= 64
    # The moving blob is centered at (32, 32); bbox must contain it.
    assert h0 <= 32 <= hn and w0 <= 32 <= wn


def test_acdc_split_deterministic(tmp_path):
    training = tmp_path / "training"
    for i in range(10):
        d = training / f"patient{i:03d}"
        d.mkdir(parents=True)
        save_nifti(np.zeros((4, 4, 1, 2), np.float32), d / f"patient{i:03d}_4d.nii.gz")
    (tmp_path / "testing").mkdir()
    s1 = acdc_pre.split_paths(tmp_path)
    s2 = acdc_pre.split_paths(tmp_path)
    assert s1 == s2
    assert len(s1["train"]) == 8 and len(s1["valid"]) == 2
    assert set(s1["train"]).isdisjoint(s1["valid"])


def test_process_acdc_volume_tree(tmp_path):
    out = tmp_path / "processed"
    stats = PreprocessStats()
    data = np.round(np.random.default_rng(0).random((24, 24, 2, 3)) * 255).astype(np.float32)
    process_acdc_volume(out, "train", "patient001", data, stats)
    # HR videos: one per depth slice.
    hr = sorted((out / "videos/train/HR/patient001").glob("*.nii.gz"))
    assert [p.name for p in hr] == [
        "patient001_2d+1d_sequence01.nii.gz",
        "patient001_2d+1d_sequence02.nii.gz",
    ]
    # LR at three factors with correct downscaled shapes.
    for f in (2, 3, 4):
        lr = load_nifti(out / f"videos/train/LR/X{f}/patient001/patient001_2d+1d_sequence01.nii.gz")
        assert lr.shape == (24 // f, 24 // f, 1, 3)
        assert lr.min() >= 0 and lr.max() <= 255
    # Per-frame images exist.
    imgs = sorted((out / "imgs/train/HR/patient001").glob("*.nii.gz"))
    assert len(imgs) == 2 * 3
    assert stats.moments.count == 24 * 24 * 2 * 3


def test_jax_backend_matches_numpy_backend(tmp_path):
    from vsr_tpu.preprocess.pipeline import downscale_sequence

    data = np.round(np.random.default_rng(1).random((24, 24, 1, 4)) * 255).astype(np.float32)
    a = downscale_sequence(data, 2, backend="numpy")
    b = downscale_sequence(data, 2, backend="jax")
    assert a.shape == b.shape
    assert (a == b).mean() > 0.98
    assert np.abs(a - b).max() <= 1.0
