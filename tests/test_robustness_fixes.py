"""Regression tests for the round-2 robustness review findings."""

import gzip
import struct

import numpy as np
import pytest

from vsr_tpu.io.nifti import load_nifti, save_nifti


def _set_scl(path, slope, inter):
    raw = gzip.decompress(path.read_bytes()) if str(path).endswith(".gz") \
        else path.read_bytes()
    raw = bytearray(raw)
    struct.pack_into("<f", raw, 112, slope)
    struct.pack_into("<f", raw, 116, inter)
    out = bytes(raw)
    path.write_bytes(gzip.compress(out) if str(path).endswith(".gz") else out)


def test_nifti_scl_slope_zero_means_no_scaling(tmp_path):
    """NIfTI-1 (and nibabel): scl_slope == 0 -> ignore BOTH slope and inter."""
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    p = tmp_path / "a.nii.gz"
    save_nifti(data, p)
    _set_scl(p, 0.0, 100.0)  # garbage inter with zero slope
    out = load_nifti(p)
    np.testing.assert_array_equal(out, data)

    _set_scl(p, 2.0, 10.0)  # real scaling still applies
    out = load_nifti(p)
    np.testing.assert_allclose(out, data.astype(np.float32) * 2 + 10)


def test_intensity_degenerate_volumes():
    from vsr_tpu.preprocess.intensity import clip_outliers_minmax

    zero = np.zeros((4, 4), np.int16)
    out = clip_outliers_minmax(zero)
    assert out.dtype == np.float32 and (out == 0).all()

    flat = np.full((4, 4), 7, np.int16)
    out = clip_outliers_minmax(flat)
    assert np.isfinite(out).all()


def test_find_bbox_no_motion_falls_back_to_full_frame():
    from vsr_tpu.preprocess.cropping import find_bbox

    frame = np.random.default_rng(0).random((16, 16)) * 255
    seq = np.repeat(frame[:, :, None, None], 4, axis=-1)  # (H, W, 1, T) identical
    h0, hn, w0, wn = find_bbox(seq)
    assert (h0, hn, w0, wn) == (0, 16, 0, 16)


def test_elastic_rejects_mixed_shapes(rng):
    from vsr_tpu.data.transforms import RandomElasticDeformation

    t = RandomElasticDeformation(prob=1.0)
    lr = rng.random((8, 8, 1)).astype(np.float32)
    hr = rng.random((16, 16, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="spatial shape"):
        t(lr, hr, rng=rng)
    # Same-shape tuples still deform fine.
    out = t(lr, lr.copy(), rng=rng)
    assert out[0].shape == lr.shape


def test_window_longer_than_sequence_rejected(tmp_path):
    from tests.synth import make_processed_tree
    from vsr_tpu.data.datasets import AcdcMISRDataset

    root = make_processed_tree(tmp_path, types=("train",), patients_per_type=1,
                               slices=1, frames=4, hr_size=16)
    with pytest.raises(ValueError, match="num_frames"):
        AcdcMISRDataset(data_dir=root / "videos", type="train",
                        downscale_factor=2, transforms=[{"name": "ToTensor"}],
                        num_frames=7)


def test_slice_ssim_per_sample(rng):
    from vsr_tpu.metrics import SliceSSIM

    a = rng.random((3, 4, 16, 16, 1)).astype(np.float32) * 255
    b = rng.random((3, 4, 16, 16, 1)).astype(np.float32) * 255
    per = np.asarray(SliceSSIM(size_average=False)(a, b))
    assert per.shape == (3,)
    scalar = float(SliceSSIM()(a, b))
    np.testing.assert_allclose(per.mean(), scalar, rtol=1e-5)


def test_dicom_series_majority_shape(tmp_path, rng):
    """A first-frame shape outlier must not discard the rest of the series."""
    from vsr_tpu.io import dicom as D

    class _Img:
        def __init__(self, n, shape):
            self.instance_number = n
            self.trigger_time = 0
            self._a = rng.random(shape).astype(np.float32)

        def array(self):
            return self._a

    imgs = [_Img(1, (8, 8))] + [_Img(i, (16, 16)) for i in range(2, 6)]
    paths = [tmp_path / f"{i}.dcm" for i in range(5)]
    orig = D.read_dicom
    D.read_dicom = lambda p, _it=iter(imgs): next(_it)
    try:
        stack = D.series_to_array(paths)
    finally:
        D.read_dicom = orig
    assert stack.shape == (16, 16, 1, 4)  # outlier dropped, majority kept
