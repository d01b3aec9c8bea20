"""Trainer coverage for the SRFB (step-stack loss) and FRVSR (two-term loss)
variants."""

import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.callbacks.monitor import Monitor
from vsr_tpu.data.datasets import AcdcSISRDataset, AcdcVSRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import FlowLoss, L1Loss, MSELoss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import FRVSRNet, SRFBNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import AcdcFRVSRTrainer, AcdcSISRSRFBTrainer

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainers_more")
    return make_processed_tree(root, types=("train", "valid"), patients_per_type=1,
                               slices=1, frames=4, hr_size=16)


def test_srfb_trainer(data_root, tmp_path):
    train_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS,
        augments=[{"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}}],
    )
    valid_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="valid", downscale_factor=2,
        transforms=TRANSFORMS,
    )
    trainer = AcdcSISRSRFBTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=SRFBNet(in_channels=1, out_channels=1, num_steps=2, num_features=4,
                    num_groups=1, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "srfb", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()
    assert (tmp_path / "srfb" / "model_1.ckpt").exists()


def test_frvsr_trainer_two_losses(data_root, tmp_path):
    train_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=TRANSFORMS,
        augments=[{"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}}],
        num_frames=3,
    )
    valid_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=TRANSFORMS, num_frames=3,
    )
    trainer = AcdcFRVSRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                     num_resblocks=1),
        loss_fns=[FlowLoss(), MSELoss()], loss_weights=[1.0, 1.0],
        metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-4), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "frvsr", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()
    assert (tmp_path / "frvsr" / "model_1.ckpt").exists()
