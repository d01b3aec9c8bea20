"""DSB15 preprocessing CLI end-to-end (incl. malformed-series skip)."""

import numpy as np

from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.preprocess import dsb15 as dsb15_pre


def test_dsb15_run(tmp_path, rng):
    raw = tmp_path / "nifti"
    # Good series: (H, W, 1, T>=30).
    good = raw / "train" / "500" / "sax_5"
    good.mkdir(parents=True)
    data = np.round(rng.random((24, 24, 1, 30)) * 255).astype(np.float32)
    save_nifti(data, good / "sax_5.nii.gz")
    # Malformed series: too few frames -> skipped (dsb15_preprocess.py:28).
    bad = raw / "train" / "500" / "sax_6"
    bad.mkdir(parents=True)
    save_nifti(np.zeros((24, 24, 1, 5), np.float32), bad / "sax_6.nii.gz")
    # int16 series in valid: exercises outlier clip + minmax.
    v = raw / "valid" / "501" / "sax_7"
    v.mkdir(parents=True)
    save_nifti((rng.random((24, 24, 1, 30)) * 900).astype(np.int16),
               v / "sax_7.nii.gz")
    (raw / "test").mkdir()

    out = tmp_path / "processed"
    dsb15_pre.run(raw, out, backend="numpy")

    # Good series emitted HR + 3 LR factors; malformed skipped.
    hr = sorted((out / "videos" / "train" / "HR" / "500").glob("*.nii.gz"))
    assert [p.name for p in hr] == ["500_2d+1d_sequence01.nii.gz"]
    for f in (2, 3, 4):
        lr = load_nifti(out / "videos" / "train" / "LR" / f"X{f}" / "500"
                        / "500_2d+1d_sequence01.nii.gz")
        assert lr.shape == (24 // f, 24 // f, 1, 30)

    # int16 valid series was min-max mapped to [0, 255].
    hr_v = load_nifti(out / "videos" / "valid" / "HR" / "501"
                      / "501_2d+1d_sequence01.nii.gz")
    assert hr_v.max() <= 255.0 and hr_v.dtype == np.float32
    # Per-frame images exist for the good series.
    imgs = list((out / "imgs" / "train" / "HR" / "500").glob("*.nii.gz"))
    assert len(imgs) == 30
