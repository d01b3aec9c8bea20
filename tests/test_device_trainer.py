import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import AcdcSISRDataset, AcdcVSRDataset
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import DRFNet, EDSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.device_trainer import DeviceEpochTrainer, stack_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dev_cache")
    return make_processed_tree(root, types=("train",), patients_per_type=2,
                               slices=2, frames=6, hr_size=24)


def test_stack_dataset(data_root):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="train",
                         downscale_factor=2, transforms=[{"name": "ToTensor"}])
    lr, hr = stack_dataset(ds)
    assert lr.shape == (24, 12, 12, 1)
    assert hr.shape == (24, 24, 24, 1)


def test_device_epoch_sisr_trains(data_root):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="train",
                         downscale_factor=2, transforms=[{"name": "ToTensor"}])
    lr, hr = stack_dataset(ds)
    trainer = DeviceEpochTrainer(
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                    num_features=4, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3),
        lr_data=lr, hr_data=hr, batch_size=4, patch=8, ratio=2,
        steps_per_epoch=10,
    )
    log1 = trainer.train_epoch()
    log5 = None
    for _ in range(4):
        log5 = trainer.train_epoch()
    assert np.isfinite(log1["Loss"]) and np.isfinite(log1["PSNR"])
    assert log5["Loss"] < log1["Loss"]  # it learns


def test_device_epoch_deterministic(data_root):
    ds = AcdcSISRDataset(data_dir=data_root / "imgs", type="train",
                         downscale_factor=2, transforms=[{"name": "ToTensor"}])
    lr, hr = stack_dataset(ds)

    def run():
        t = DeviceEpochTrainer(
            net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=Adam(lr=1e-3),
            lr_data=lr, hr_data=hr, batch_size=4, patch=8, ratio=2,
            steps_per_epoch=5, random_seed="vsr",
        )
        t.train_epoch()
        import jax

        return np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree_util.tree_leaves(t.params)])

    np.testing.assert_array_equal(run(), run())


def test_device_epoch_vsr_windows(data_root):
    ds = AcdcVSRDataset(data_dir=data_root / "videos", type="train",
                        downscale_factor=2, transforms=[{"name": "ToTensor"}],
                        num_frames=3)
    lr, hr = stack_dataset(ds, limit=12)
    assert lr.shape == (12, 3, 12, 12, 1)
    trainer = DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                   upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=1e-3),
        lr_data=lr, hr_data=hr, batch_size=2, patch=8, ratio=2,
        steps_per_epoch=3,
    )
    log = trainer.train_epoch()
    assert np.isfinite(log["Loss"])


def test_device_epoch_sequence_window_mode(tmp_path):
    """Whole sequences in HBM; windows gathered on device with wrap."""
    import jax

    from vsr_tpu.models import DRFNet

    # Build (S, T, h, w, C) sequence buffers directly from a synth tree.
    from vsr_tpu.data.datasets import AcdcVSRDataset

    root = make_processed_tree(tmp_path / "seqs", types=("valid",),
                               patients_per_type=2, slices=2, frames=6,
                               hr_size=24)
    ds = AcdcVSRDataset(data_dir=root / "videos", type="valid",
                        downscale_factor=2, transforms=[{"name": "ToTensor"}],
                        num_frames=3)
    lrs, hrs = [], []
    for i in range(len(ds)):
        s = ds.__getitem__(i)
        lrs.append(s["lr_imgs"])
        hrs.append(s["hr_imgs"])
    lr = np.stack(lrs)  # (S, T_full, h, w, C)
    hr = np.stack(hrs)

    trainer = DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                   upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=1e-3),
        lr_data=lr, hr_data=hr, batch_size=2, patch=8, ratio=2,
        steps_per_epoch=3, window=3,
    )
    log = trainer.train_epoch()
    assert np.isfinite(log["Loss"])
    leaves = jax.tree_util.tree_leaves(trainer.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
