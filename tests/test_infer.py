import argparse

import numpy as np

from vsr_tpu.infer import run
from vsr_tpu.io.nifti import load_nifti, save_nifti


def _args(**kw):
    defaults = dict(net="Bicubic", net_kwargs='{"upscale_factor": 2}',
                    checkpoint="", factor=2, dataset="acdc", gif=True, bf16=False)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_infer_bicubic_end_to_end(tmp_path, rng):
    src = tmp_path / "raw"
    (src / "patientA").mkdir(parents=True)
    vol = np.round(rng.random((24, 24, 2, 3)) * 255).astype(np.float32)
    save_nifti(vol, src / "patientA" / "patientA_4d.nii.gz")

    out = tmp_path / "sr"
    stats = run(_args(input_dir=src, output_dir=out))
    assert stats["volumes"] == 1 and stats["frames"] == 6

    sr = load_nifti(out / "patientA" / "patientA_4d_sr.nii.gz")
    assert sr.shape == (24, 24, 2, 3)  # x2 SR of the x2-degraded LR
    assert sr.min() >= 0 and sr.max() <= 255
    gifs = list((out / "patientA").glob("*.gif"))
    assert len(gifs) == 2
