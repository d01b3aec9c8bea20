"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
xla_force_host_platform_device_count=8) — the TPU-world analogue of testing
multi-node code without a cluster."""

import jax
import numpy as np
import pytest

from tests.synth import make_processed_tree
from vsr_tpu.parallel.mesh import make_mesh


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 8})
    assert mesh.shape == {"data": 8}
    mesh = make_mesh({"data": 4, "spatial": 2})
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh = make_mesh({"data": -1, "spatial": 2})
    assert mesh.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("processed_dp")
    return make_processed_tree(
        root, types=("train", "valid"), patients_per_type=2, slices=2,
        frames=4, hr_size=16,
    )


def _make_trainer(data_root, tmp_path, mesh_axes=None, seed="vsr"):
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcSISRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcSISRTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    augments = [{"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}}]
    train_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="train", downscale_factor=2,
        transforms=transforms, augments=augments,
    )
    valid_ds = AcdcSISRDataset(
        data_dir=data_root / "imgs", type="valid", downscale_factor=2,
        transforms=transforms,
    )
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=1, num_features=4, upscale_factor=2)
    monitor = Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min", target="Loss",
                      saved_freq=10, early_stop=0)
    return AcdcSISRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=8, shuffle=True, drop_last=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=net,
        loss_fns=[L1Loss()],
        loss_weights=[1.0],
        metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3),
        lr_scheduler=None,
        logger=None,
        monitor=monitor,
        num_epochs=1,
        random_seed=seed,
        mesh_axes=mesh_axes,
    )


def _flat(params):
    return np.concatenate([np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(params)])


def test_dp_trainer_matches_single_device(data_root, tmp_path):
    """The 8-way shard_map data-parallel step must produce the same params as
    the single-device step on the identical global batches (both compute the
    mean gradient over the global batch)."""
    t_dp = _make_trainer(data_root, tmp_path / "dp", mesh_axes={"data": 8})
    t_dp.train()
    t_single = _make_trainer(data_root, tmp_path / "single", mesh_axes=None)
    t_single.train()
    np.testing.assert_allclose(_flat(t_dp.params), _flat(t_single.params), atol=2e-6)


def test_dp_vsr_trainer_with_flagship(data_root, tmp_path):
    """DP path through the VSR trainer with the recurrent flagship net."""
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcVSRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import DRFNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.trainers import AcdcVSRTrainer

    transforms = [{"name": "ToTensor"}]
    train_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="train", downscale_factor=2,
        transforms=transforms, num_frames=3,
    )
    valid_ds = AcdcVSRDataset(
        data_dir=data_root / "videos", type="valid", downscale_factor=2,
        transforms=transforms, num_frames=3,
    )
    trainer = AcdcVSRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=8, shuffle=True, drop_last=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                   upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "vsr_dp", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=1,
        mesh_axes={"data": 8},
    )
    trainer.train()
    assert (tmp_path / "vsr_dp" / "model_1.ckpt").exists()


def test_dp_scalars_match_single(data_root, tmp_path):
    t_dp = _make_trainer(data_root, tmp_path / "dp2", mesh_axes={"data": 8})
    t_dp._ensure_initialized()
    batch = next(t_dp.train_dataloader.epoch(t_dp.rng_tree, 0))
    inputs, targets = t_dp._get_inputs_targets(batch)
    p0 = t_dp.params
    _, _, dp_scalars, _ = t_dp._dp_eval_step(p0, t_dp.opt_state, inputs, targets)
    _, _, single_scalars, _ = t_dp._eval_step(p0, t_dp.opt_state, inputs, targets, training=False)
    for k in single_scalars:
        assert float(dp_scalars[k]) == pytest.approx(float(single_scalars[k]), rel=2e-5), k
