import numpy as np
import pytest

from vsr_tpu.io.nifti import load_nifti, save_nifti


@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64]
)
def test_roundtrip_dtypes(tmp_path, rng, ext, dtype):
    shape = (9, 7, 1, 5)
    data = (rng.random(shape) * 100).astype(dtype)
    path = tmp_path / f"x{ext}"
    save_nifti(data, path)
    loaded = load_nifti(path)
    assert loaded.dtype == dtype
    assert loaded.shape == shape
    np.testing.assert_array_equal(loaded, data)


def test_fortran_order_matches_nifti_convention(tmp_path):
    # Voxel (0,0,...) must be first on disk and x must vary fastest.
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "f.nii"
    save_nifti(data, path)
    raw = path.read_bytes()
    vox = np.frombuffer(raw, dtype=np.float32, offset=352)
    np.testing.assert_array_equal(vox.reshape(2, 3, 4, order="F"), data)
    np.testing.assert_array_equal(load_nifti(path), data)


def test_2d_and_3d_shapes(tmp_path, rng):
    for shape in [(5, 4), (6, 5, 3), (4, 4, 2, 7)]:
        data = rng.standard_normal(shape).astype(np.float32)
        p = tmp_path / f"s{len(shape)}.nii.gz"
        save_nifti(data, p)
        assert load_nifti(p).shape == shape


def test_header_fields(tmp_path, rng):
    data = rng.standard_normal((4, 5, 6)).astype(np.float32)
    p = tmp_path / "h.nii"
    save_nifti(data, p, pixdim=(1.5, 1.5, 8.0))
    loaded, header = load_nifti(p, with_header=True)
    assert header.shape == (4, 5, 6)
    assert header.pixdim == pytest.approx((1.5, 1.5, 8.0))
    np.testing.assert_array_equal(header.affine, np.eye(4, dtype=np.float32))


def test_deterministic_gzip_bytes(tmp_path, rng):
    data = rng.standard_normal((8, 8, 1)).astype(np.float32)
    p1, p2 = tmp_path / "a.nii.gz", tmp_path / "b.nii.gz"
    save_nifti(data, p1)
    save_nifti(data, p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_scl_slope_applied(tmp_path):
    # Hand-craft a file with slope/inter to check nibabel-compatible scaling.
    data = np.arange(6, dtype=np.int16).reshape(3, 2)
    p = tmp_path / "scaled.nii"
    save_nifti(data, p)
    raw = bytearray(p.read_bytes())
    import struct

    struct.pack_into("<2f", raw, 112, 2.0, 10.0)  # scl_slope=2, scl_inter=10
    p.write_bytes(bytes(raw))
    loaded = load_nifti(p)
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, data.astype(np.float32) * 2 + 10)
