"""Full-protocol integration test: raw ACDC-style 4D NIfTI -> preprocessing
CLI -> cardiac cropping -> train -> predict with Cardiac* metrics + exports.

This is the rebuild's equivalent of running the reference's entire
README workflow end to end on a miniature dataset.
"""

import numpy as np
import pytest

from vsr_tpu.io.nifti import load_nifti, save_nifti
from vsr_tpu.preprocess import acdc as acdc_pre
from vsr_tpu.preprocess import cropping


def _raw_volume(rng, h=24, w=24, d=2, t=4):
    """int16 volume with a bright moving blob (so cropping finds a bbox)."""
    yy, xx = np.mgrid[:h, :w]
    vol = np.zeros((h, w, d, t), np.int16)
    for ti in range(t):
        cy = h // 2 + int(3 * np.cos(2 * np.pi * ti / t))
        blob = 900 * np.exp(-((yy - cy) ** 2 + (xx - w // 2) ** 2) / 30.0)
        noise = rng.integers(0, 100, (h, w))
        for di in range(d):
            vol[..., di, ti] = (blob + noise).astype(np.int16)
    return vol


@pytest.mark.slow
def test_raw_to_prediction(tmp_path, rng):
    # --- 1. Raw dataset tree (ACDC layout) -------------------------------
    raw = tmp_path / "raw"
    for i in range(3):
        pdir = raw / "training" / f"patient{i + 1:03d}"
        pdir.mkdir(parents=True)
        save_nifti(_raw_volume(rng), pdir / f"patient{i + 1:03d}_4d.nii.gz")
    (raw / "testing" / "patient901").mkdir(parents=True)
    save_nifti(_raw_volume(rng), raw / "testing" / "patient901" / "patient901_4d.nii.gz")

    # --- 2. Offline preprocessing (both backends give the same tree) ------
    processed = tmp_path / "processed"
    acdc_pre.run(raw, processed, backend="numpy")
    hr_videos = sorted((processed / "videos" / "train" / "HR").glob("**/*.nii.gz"))
    assert hr_videos, "preprocessing produced no sequences"
    lr = load_nifti(
        sorted((processed / "videos" / "train" / "LR" / "X2").glob("**/*.nii.gz"))[0]
    )
    assert lr.shape == (12, 12, 1, 4)  # 24/12-crop -> 24, /2

    # --- 3. Cardiac ROI cropping ------------------------------------------
    cropped = tmp_path / "cropped"
    cropped.mkdir()
    coords = cropping.run(processed / "videos" / "valid" / "HR", cropped)
    assert (cropped / "coordinates.pkl").exists()
    assert all(len(v) == 4 for v in coords.values())

    # --- 4. Train EDSR x2 on the processed imgs tree ----------------------
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcSISRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, CardiacPSNR, CardiacSSIM
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcSISRTrainer
    from vsr_tpu.runner.predictors import AcdcSISRPredictor

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    augments = [
        {"name": "RandomHorizontalFlip"},
        {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}},
    ]
    imgs = processed / "imgs"
    net_kw = dict(in_channels=1, out_channels=1, num_resblocks=1, num_features=4,
                  upscale_factor=2)
    trainer = AcdcSISRTrainer(
        train_dataloader=Dataloader(
            AcdcSISRDataset(data_dir=imgs, type="train", downscale_factor=2,
                            transforms=transforms, augments=augments),
            batch_size=4, shuffle=True,
        ),
        valid_dataloader=Dataloader(
            AcdcSISRDataset(data_dir=imgs, type="valid", downscale_factor=2,
                            transforms=transforms),
            batch_size=1,
        ),
        net=EDSRNet(**net_kw),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()

    # --- 5. Predict on the test split with cardiac-ROI metrics ------------
    # Cardiac bboxes were computed on valid patients; test patients need
    # their own entry — reuse via the test patient name.
    import pickle

    test_coords = {"patient901": next(iter(coords.values()))}
    with open(cropped / "test_coords.pkl", "wb") as f:
        pickle.dump(test_coords, f)

    predictor = AcdcSISRPredictor(
        test_dataloader=Dataloader(
            AcdcSISRDataset(data_dir=imgs, type="test", downscale_factor=2,
                            transforms=transforms),
            batch_size=1,
        ),
        net=EDSRNet(**net_kw),
        loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[PSNR(), CardiacPSNR(str(cropped / "test_coords.pkl")),
                    CardiacSSIM(str(cropped / "test_coords.pkl"))],
        saved_dir=str(tmp_path / "pred"),
        exported=True,
    )
    predictor.load(tmp_path / "ckpt" / "model_best.ckpt")
    log = predictor.predict()
    assert np.isfinite(log["PSNR"]) and np.isfinite(log["CardiacPSNR"])
    assert (tmp_path / "pred" / "results.csv").exists()
    rows = (tmp_path / "pred" / "results.csv").read_text().splitlines()
    assert rows[0].startswith("name,PSNR,CardiacPSNR,CardiacSSIM,L1Loss")
