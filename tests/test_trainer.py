"""End-to-end trainer/predictor tests on synthetic data — the analogue of the
reference's MNIST run-twice bitwise-determinism test (test_trainer.py:93-133),
without the network download."""

import jax
import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.callbacks.logger import SISRLogger
from vsr_tpu.callbacks.monitor import Monitor
from vsr_tpu.data.datasets import AcdcSISRDataset, AcdcVSRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR, SSIM
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam, StepLR, get_learning_rate
from vsr_tpu.runner.trainers import AcdcSISRTrainer
from vsr_tpu.runner.predictors import AcdcSISRPredictor

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]
AUGMENTS = [
    {"name": "RandomHorizontalFlip"},
    {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}},
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("processed")
    return make_processed_tree(
        root, types=("train", "valid", "test"), patients_per_type=1, slices=1,
        frames=4, hr_size=16,
    )


def _make_trainer(data_root, tmp_path, num_epochs=2, seed="vsr", logger=None):
    train_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=AUGMENTS,
    )
    valid_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="valid", downscale_factor=2,
        transforms=TRANSFORMS,
    )
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1, num_features=4, upscale_factor=2)
    monitor = Monitor(
        checkpoints_dir=tmp_path / "ckpt", mode="min", target="Loss",
        saved_freq=2, early_stop=0,
    )
    return AcdcSISRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=net,
        loss_fns=[L1Loss()],
        loss_weights=[1.0],
        metric_fns=[PSNR(), SSIM()],
        optimizer=Adam(lr=1e-3),
        lr_scheduler=StepLR(step_size=1, gamma=0.5),
        logger=logger,
        monitor=monitor,
        num_epochs=num_epochs,
        random_seed=seed,
    )


def _flat_params(params):
    return np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(params)]
    )


def test_trainer_runs_and_checkpoints(data_root, tmp_path):
    trainer = _make_trainer(data_root, tmp_path)
    trainer.train()
    assert (tmp_path / "ckpt" / "model_2.ckpt").exists()
    assert (tmp_path / "ckpt" / "model_best.ckpt").exists()


def test_determinism_run_twice_bitwise_equal(data_root, tmp_path):
    t1 = _make_trainer(data_root, tmp_path / "a")
    t1.train()
    t2 = _make_trainer(data_root, tmp_path / "b")
    t2.train()
    np.testing.assert_array_equal(_flat_params(t1.params), _flat_params(t2.params))


def test_different_seed_different_params(data_root, tmp_path):
    t1 = _make_trainer(data_root, tmp_path / "a", seed="vsr")
    t1.train()
    t2 = _make_trainer(data_root, tmp_path / "b", seed="other")
    t2.train()
    assert not np.array_equal(_flat_params(t1.params), _flat_params(t2.params))


def test_scheduler_applied(data_root, tmp_path):
    trainer = _make_trainer(data_root, tmp_path)
    trainer.train()
    # StepLR(step=1, gamma=0.5) after 2 epochs: lr = 1e-3 * 0.25.
    assert get_learning_rate(trainer.opt_state) == pytest.approx(2.5e-4)


def test_resume_matches_straight_run(data_root, tmp_path):
    # Straight 4-epoch run.
    full = _make_trainer(data_root, tmp_path / "full", num_epochs=4)
    full.train()
    # 2 epochs, checkpoint, resume to 4.
    part = _make_trainer(data_root, tmp_path / "part", num_epochs=2)
    part.train()
    ckpt = tmp_path / "part" / "ckpt" / "model_2.ckpt"
    resumed = _make_trainer(data_root, tmp_path / "resumed", num_epochs=4)
    resumed.load(ckpt)
    assert resumed.epoch == 3
    resumed.train()
    np.testing.assert_allclose(
        _flat_params(full.params), _flat_params(resumed.params), atol=1e-7
    )


def test_logger_writes(data_root, tmp_path):
    logger = SISRLogger(log_dir=tmp_path / "log")
    trainer = _make_trainer(data_root, tmp_path, logger=logger)
    trainer.train()
    lines = (tmp_path / "log" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[0])
    assert set(rec) == {"epoch", "train", "valid"}
    assert {"Loss", "L1Loss", "PSNR", "SSIM"} <= set(rec["train"])
    images = list((tmp_path / "log" / "images").glob("*.png"))
    assert len(images) == 2


def test_predictor_with_exports(data_root, tmp_path):
    trainer = _make_trainer(data_root, tmp_path)
    trainer.train()

    test_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="test", downscale_factor=2,
        transforms=TRANSFORMS,
    )
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1, num_features=4, upscale_factor=2)
    predictor = AcdcSISRPredictor(
        test_dataloader=Dataloader(test_ds, batch_size=1),
        net=net,
        loss_fns=[L1Loss()],
        loss_weights=[1.0],
        metric_fns=[PSNR()],
        saved_dir=str(tmp_path / "results"),
        exported=True,
    )
    predictor.load(tmp_path / "ckpt" / "model_best.ckpt")
    log = predictor.predict()
    assert "PSNR" in log and np.isfinite(log["PSNR"])

    csv_path = tmp_path / "results" / "results.csv"
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) == 1 + len(test_ds)
    pngs = list((tmp_path / "results" / "imgs").glob("**/*.png"))
    assert len(pngs) == len(test_ds)
    gifs = list((tmp_path / "results" / "videos").glob("**/*.gif"))
    assert len(gifs) == 1  # one sequence incl. trailing flush


def test_vsr_trainer_smoke(data_root, tmp_path):
    from vsr_tpu.runner.trainers import AcdcVSRTrainer
    from flax import linen as nn

    class TinyVSR(nn.Module):
        """Per-frame conv upsampler over (N, T, h, w, C) stacks."""

        @nn.compact
        def __call__(self, x):
            n, t, h, w, c = x.shape
            y = x.reshape(n * t, h, w, c)
            y = nn.Conv(4, (3, 3), padding="SAME")(y)
            y = nn.Conv(4 * c, (3, 3), padding="SAME")(nn.relu(y))
            from vsr_tpu.ops.pixel_shuffle import pixel_shuffle

            y = pixel_shuffle(y, 2)
            return y.reshape(n, t, h * 2, w * 2, c)

    train_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=TRANSFORMS, augments=[{"name": "RandomHorizontalFlip"}], num_frames=3,
    )
    valid_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=TRANSFORMS, num_frames=3,
    )
    monitor = Monitor(
        checkpoints_dir=tmp_path / "vsr_ckpt", mode="min", target="Loss",
        saved_freq=1, early_stop=0,
    )
    trainer = AcdcVSRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=TinyVSR(),
        loss_fns=[L1Loss()],
        loss_weights=[1.0],
        metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3),
        lr_scheduler=None,
        logger=None,
        monitor=monitor,
        num_epochs=1,
    )
    trainer.train()
    assert (tmp_path / "vsr_ckpt" / "model_1.ckpt").exists()
