import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.data.datasets import AcdcVolumeDataset
from vsr_tpu.models.vol3d import Volume3DSRNet, _pixel_shuffle_2d_in_3d


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vol3d")
    return make_processed_tree(root, types=("train", "valid"), patients_per_type=2,
                               slices=3, frames=4, hr_size=24)


def test_inplane_shuffle(rng):
    x = jnp.asarray(rng.random((1, 3, 4, 4, 8)), jnp.float32)
    out = _pixel_shuffle_2d_in_3d(x, 2)
    assert out.shape == (1, 3, 8, 8, 2)
    # Depth must be untouched: each depth slice equals 2D pixel shuffle.
    from vsr_tpu.ops.pixel_shuffle import pixel_shuffle

    for d in range(3):
        np.testing.assert_allclose(
            np.asarray(out[0, d]), np.asarray(pixel_shuffle(x[0, d], 2)), atol=1e-6
        )


@pytest.mark.parametrize("factor", [2, 3])
def test_vol3d_shapes(factor):
    net = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=factor)
    x = jnp.zeros((1, 3, 8, 8, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1, 3, 8 * factor, 8 * factor, 1)


def test_volume_dataset(data_root):
    ds = AcdcVolumeDataset(data_dir=data_root / "videos", type="train",
                           downscale_factor=2, transforms=[{"name": "ToTensor"}])
    assert len(ds) == 2 * 4  # patients * frames
    s = ds.__getitem__(0)
    assert s["lr_vol"].shape == (12, 12, 3, 1)  # (h, w, D, C)
    assert s["hr_vol"].shape == (24, 24, 3, 1)


def test_volume_trainer(data_root, tmp_path):
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SSIM
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import Acdc3DSRTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    augments = [
        {"name": "RandomHorizontalFlip"},
        {"name": "RandomCropPatch", "kwargs": {"size": [8, 8, 3], "ratio": 2}},
    ]
    train_ds = AcdcVolumeDataset(data_dir=data_root / "videos", type="train",
                                 downscale_factor=2, transforms=transforms,
                                 augments=augments)
    valid_ds = AcdcVolumeDataset(data_dir=data_root / "videos", type="valid",
                                 downscale_factor=2, transforms=transforms)
    trainer = Acdc3DSRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                          num_features=4, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
    )
    trainer.train()
    assert (tmp_path / "ckpt" / "model_1.ckpt").exists()


def test_volume_predictor(data_root, tmp_path):
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SSIM
    from vsr_tpu.runner.predictors import Acdc3DSRPredictor

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    ds = AcdcVolumeDataset(data_dir=data_root / "videos", type="valid",
                           downscale_factor=2, transforms=transforms)
    p = Acdc3DSRPredictor(
        test_dataloader=Dataloader(ds, batch_size=1),
        net=Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                          num_features=4, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[PSNR()],  # SSIM dim=3 needs depth >= 11 (valid window)
        saved_dir=str(tmp_path / "vol_pred"), exported=True,
    )
    log = p.predict()
    assert np.isfinite(log["PSNR"])
    assert (tmp_path / "vol_pred" / "results.csv").exists()
    vols = list((tmp_path / "vol_pred" / "volumes").glob("**/*_sr.nii.gz"))
    assert len(vols) == len(ds)
