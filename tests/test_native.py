"""Native C++ NIfTI decode core tests (builds the library with g++)."""

import numpy as np
import pytest

from vsr_tpu.io.native import available, build, load_nifti_batch, load_nifti_native
from vsr_tpu.io.nifti import load_nifti, save_nifti


@pytest.fixture(scope="module", autouse=True)
def built():
    build()
    assert available()


def test_single_decode_matches_python(tmp_path, rng):
    data = (rng.random((24, 20, 1, 8)) * 255).astype(np.float32)
    p = tmp_path / "x.nii.gz"
    save_nifti(data, p)
    native = load_nifti_native(p)
    np.testing.assert_array_equal(native, load_nifti(p))
    assert native.dtype == np.float32


def test_decode_uncompressed(tmp_path, rng):
    data = (rng.random((8, 8, 2)) * 100).astype(np.float32)
    p = tmp_path / "x.nii"
    save_nifti(data, p)
    np.testing.assert_array_equal(load_nifti_native(p), data)


def test_int16_converted_to_float(tmp_path, rng):
    data = (rng.random((10, 10)) * 1000).astype(np.int16)
    p = tmp_path / "i.nii.gz"
    save_nifti(data, p)
    out = load_nifti_native(p)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, data.astype(np.float32))


def test_batch_decode(tmp_path, rng):
    paths, arrays = [], []
    for i in range(6):
        data = (rng.random((12 + i, 10, 1, 4)) * 255).astype(np.float32)
        p = tmp_path / f"b{i}.nii.gz"
        save_nifti(data, p)
        paths.append(p)
        arrays.append(data)
    outs = load_nifti_batch(paths, n_threads=4)
    for out, ref in zip(outs, arrays):
        np.testing.assert_array_equal(out, ref)


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        load_nifti_native(tmp_path / "nope.nii.gz")
