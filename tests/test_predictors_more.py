"""Predictor coverage for the SRFB (step-stack) and MISR variants, and the
VSR predictor with a tuple-output (FRVSR-style) net."""

import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import AcdcMISRDataset, AcdcSISRDataset, AcdcVSRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFSISRNet, FRVSRNet, TOFlowNet
from vsr_tpu.runner.predictors import (
    AcdcMISRPredictor,
    AcdcSISRSRFBPredictor,
    AcdcVSRPredictor,
)

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pred_more")
    return make_processed_tree(root, types=("test",), patients_per_type=1,
                               slices=2, frames=4, hr_size=16)


def test_srfb_predictor(data_root, tmp_path):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="test",
                         downscale_factor=2, transforms=TRANSFORMS)
    p = AcdcSISRSRFBPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=DRFSISRNet(in_channels=1, out_channels=1, num_steps=2,
                       num_features=4, num_groups=1, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "srfb"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["Loss"]) and np.isfinite(log["PSNR"])
    assert (tmp_path / "srfb" / "results.csv").exists()
    # Exported images are HR-sized (last step of the stack).
    pngs = list((tmp_path / "srfb" / "imgs").glob("**/*.png"))
    assert len(pngs) == len(ds)


def test_misr_predictor(data_root, tmp_path):
    ds = AcdcMISRDataset(data_dir=data_root / "videos", type="test",
                         downscale_factor=2, transforms=TRANSFORMS, num_frames=3)
    p = AcdcMISRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=TOFlowNet(in_channels=1, out_channels=1, num_frames=3, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "misr"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"])
    gifs = list((tmp_path / "misr" / "videos").glob("**/*.gif"))
    assert len(gifs) == 2  # both sequences incl. trailing flush


def test_vsr_predictor_with_tuple_output_net(data_root, tmp_path):
    ds = AcdcVSRDataset(data_dir=data_root / "videos", type="test",
                        downscale_factor=2, transforms=TRANSFORMS, num_frames=3)
    p = AcdcVSRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                     num_resblocks=1),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "frvsr"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"])
    rows = (tmp_path / "frvsr" / "results.csv").read_text().strip().splitlines()
    assert len(rows) == 1 + 2 * 4  # header + 2 sequences x 4 frames
