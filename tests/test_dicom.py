"""DICOM reader tests with synthetically-written files (both explicit and
implicit VR little endian)."""

import struct

import numpy as np
import pytest

from vsr_tpu.io.dicom import convert_dsb15, read_dicom, series_to_array
from vsr_tpu.io.nifti import load_nifti


def _el_explicit(group, elem, vr, value: bytes) -> bytes:
    if vr in (b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"):
        return struct.pack("<HH2sHI", group, elem, vr, 0, len(value)) + value
    return struct.pack("<HH2sH", group, elem, vr, len(value)) + value


def _el_implicit(group, elem, value: bytes) -> bytes:
    return struct.pack("<HHI", group, elem, len(value)) + value


def write_dicom(path, pixel: np.ndarray, instance: int, explicit=True,
                slope=None, intercept=None):
    rows, cols = pixel.shape
    body = b""
    mk = (lambda g, e, vr, v: _el_explicit(g, e, vr, v)) if explicit else (
        lambda g, e, vr, v: _el_implicit(g, e, v)
    )
    body += mk(0x0020, 0x0013, b"IS", str(instance).encode())
    body += mk(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += mk(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += mk(0x0028, 0x0030, b"DS", b"1.5\\1.5")
    body += mk(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += mk(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    if slope is not None:
        body += mk(0x0028, 0x1052, b"DS", str(intercept).encode())
        body += mk(0x0028, 0x1053, b"DS", str(slope).encode())
    pix = pixel.astype("<u2").tobytes()
    body += mk(0x7FE0, 0x0010, b"OW", pix)

    syntax = b"1.2.840.10008.1.2.1" if explicit else b"1.2.840.10008.1.2\x00"
    meta = _el_explicit(0x0002, 0x0010, b"UI", syntax)
    with open(path, "wb") as f:
        f.write(b"\0" * 128 + b"DICM" + meta + body)


@pytest.mark.parametrize("explicit", [True, False])
def test_read_roundtrip(tmp_path, rng, explicit):
    pixel = (rng.random((10, 12)) * 1000).astype(np.uint16)
    p = tmp_path / "f.dcm"
    write_dicom(p, pixel, instance=3, explicit=explicit)
    img = read_dicom(p)
    assert (img.rows, img.cols) == (10, 12)
    assert img.instance_number == 3
    assert img.pixel_spacing == (1.5, 1.5)
    np.testing.assert_array_equal(img.array(), pixel)


def test_rescale_applied(tmp_path, rng):
    pixel = np.full((4, 4), 100, np.uint16)
    p = tmp_path / "r.dcm"
    write_dicom(p, pixel, instance=1, slope=2.0, intercept=-10.0)
    arr = read_dicom(p).array()
    np.testing.assert_allclose(arr, 190.0)


def test_series_sorted_by_instance(tmp_path, rng):
    for i, inst in enumerate([2, 1, 3]):
        pixel = np.full((6, 6), inst, np.uint16)
        write_dicom(tmp_path / f"f{i}.dcm", pixel, instance=inst)
    stack = series_to_array(sorted(tmp_path.glob("*.dcm")))
    assert stack.shape == (6, 6, 1, 3)
    np.testing.assert_array_equal(stack[0, 0, 0], [1, 2, 3])


def test_convert_dsb15_layout(tmp_path, rng):
    case = tmp_path / "raw" / "train" / "500" / "study" / "sax_5"
    case.mkdir(parents=True)
    for i in range(3):
        pixel = (rng.random((8, 8)) * 500).astype(np.uint16)
        write_dicom(case / f"im{i}.dcm", pixel, instance=i + 1)
    val_case = tmp_path / "raw" / "validate" / "501" / "study" / "sax_6"
    val_case.mkdir(parents=True)
    for i in range(2):
        write_dicom(val_case / f"im{i}.dcm",
                    (rng.random((8, 8)) * 500).astype(np.uint16), instance=i + 1)

    convert_dsb15(tmp_path / "raw", tmp_path / "nifti")
    out = tmp_path / "nifti" / "train" / "500" / "sax_5" / "sax_5.nii.gz"
    assert out.exists()
    data = load_nifti(out)
    assert data.shape == (8, 8, 1, 3)
    assert data.dtype == np.int16
    # validate -> valid rename
    assert (tmp_path / "nifti" / "valid" / "501" / "sax_6" / "sax_6.nii.gz").exists()
