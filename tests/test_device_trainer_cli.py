"""Config-driven device-epoch trainers: CLI run, resume, and checkpoint
interop with the host-loop trainers (VERDICT round-1 item #6; reference
trainer contract ``base_trainer.py:46-97``)."""

import numpy as np
import yaml

from tests.synth import make_processed_tree
from vsr_tpu.config import load_config
from vsr_tpu.main import run_train


def _write_yaml(path, data):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(data, f)


def _device_cfg(root, saved_dir, num_epochs=1, loaded_path=None,
                trainer_name="AcdcSISRDeviceTrainer"):
    cfg = {
        "main": {"random_seed": "vsr", "saved_dir": str(saved_dir)},
        "dataset": {
            "name": "AcdcSISRDataset",
            "kwargs": {
                "data_dir": str(root / "imgs"),
                "downscale_factor": 2,
                "transforms": [
                    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                    {"name": "ToTensor"},
                ],
                "augments": [
                    {"name": "RandomHorizontalFlip"},
                    {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 2}},
                ],
            },
        },
        "dataloader": {
            "name": "Dataloader",
            "kwargs": {"train_batch_size": 2, "valid_batch_size": 1,
                       "shuffle": True, "num_workers": 0},
        },
        "net": {
            "name": "EDSRNet",
            "kwargs": {"in_channels": 1, "out_channels": 1, "num_resblocks": 1,
                       "num_features": 4, "upscale_factor": 2},
        },
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3, "weight_decay": 0}},
        "logger": {"name": "AcdcSISRLogger", "kwargs": {}},
        "monitor": {"name": "Monitor",
                    "kwargs": {"mode": "min", "target": "Loss",
                               "saved_freq": 1, "early_stop": 0}},
        "trainer": {"name": trainer_name,
                    "kwargs": {"num_epochs": num_epochs, "patch": 8,
                               "ratio": 2, "steps_per_epoch": 4}},
    }
    if trainer_name == "AcdcSISRTrainer":
        cfg["trainer"]["kwargs"] = {"num_epochs": num_epochs}
    if loaded_path:
        cfg["main"]["loaded_path"] = str(loaded_path)
    return cfg


def test_device_trainer_via_cli_and_resume(tmp_path):
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=4,
                               hr_size=16)
    saved = tmp_path / "results"
    cfg = _device_cfg(root, saved)
    path = tmp_path / "device.yaml"
    _write_yaml(path, cfg)
    run_train(load_config(path))
    ckpt = saved / "checkpoints" / "model_1.ckpt"
    assert ckpt.exists()
    assert (saved / "log" / "metrics.jsonl").exists()  # logger parity

    # Resume through the CLI path (epoch continues at 2).
    cfg2 = _device_cfg(root, saved, num_epochs=2, loaded_path=ckpt)
    path2 = tmp_path / "device_resume.yaml"
    _write_yaml(path2, cfg2)
    run_train(load_config(path2))
    assert (saved / "checkpoints" / "model_2.ckpt").exists()


def test_device_host_checkpoint_interop(tmp_path):
    """A device-trainer checkpoint loads into the host-loop trainer and
    vice versa (same params/opt_state/monitor structures)."""
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=4,
                               hr_size=16)
    # Device -> host.
    dev_saved = tmp_path / "dev"
    _write_yaml(tmp_path / "a.yaml", _device_cfg(root, dev_saved))
    run_train(load_config(tmp_path / "a.yaml"))
    ckpt = dev_saved / "checkpoints" / "model_1.ckpt"
    host_saved = tmp_path / "host"
    _write_yaml(tmp_path / "b.yaml",
                _device_cfg(root, host_saved, num_epochs=2, loaded_path=ckpt,
                            trainer_name="AcdcSISRTrainer"))
    run_train(load_config(tmp_path / "b.yaml"))
    assert (host_saved / "checkpoints" / "model_2.ckpt").exists()

    # Host -> device.
    dev2_saved = tmp_path / "dev2"
    _write_yaml(tmp_path / "c.yaml",
                _device_cfg(root, dev2_saved, num_epochs=3,
                            loaded_path=host_saved / "checkpoints" / "model_2.ckpt"))
    run_train(load_config(tmp_path / "c.yaml"))
    assert (dev2_saved / "checkpoints" / "model_3.ckpt").exists()


def test_device_vsr_trainer_trains(tmp_path):
    """The VSR device twin (windows + masked targets) runs and learns."""
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=6,
                               hr_size=16)
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcVSRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import DRFNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.device_trainer import AcdcVSRDeviceTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    train_ds = AcdcVSRDataset(data_dir=root / "videos", type="train",
                              downscale_factor=2, transforms=transforms,
                              num_frames=3)
    valid_ds = AcdcVSRDataset(data_dir=root / "videos", type="valid",
                              downscale_factor=2, transforms=transforms,
                              num_frames=3)
    trainer = AcdcVSRDeviceTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                   upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=1, early_stop=0),
        num_epochs=2, patch=8, ratio=2, steps_per_epoch=6,
    )
    trainer.train()
    assert (tmp_path / "ckpt" / "model_2.ckpt").exists()


def test_device_trainer_data_parallel_mesh(tmp_path):
    """Device-epoch training over a data-parallel mesh: sharded sample
    buffers, per-device sampling, pmean'd grads inside the epoch scan."""
    import jax

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=2, slices=2, frames=4,
                               hr_size=16)
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcSISRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.device_trainer import AcdcSISRDeviceTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]

    def make():
        train_ds = AcdcSISRDataset(data_dir=root / "imgs", type="train",
                                   downscale_factor=2, transforms=transforms)
        valid_ds = AcdcSISRDataset(data_dir=root / "imgs", type="valid",
                                   downscale_factor=2, transforms=transforms)
        return AcdcSISRDeviceTrainer(
            train_dataloader=Dataloader(train_ds, batch_size=16, shuffle=True),
            valid_dataloader=Dataloader(valid_ds, batch_size=1),
            net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                        num_features=4, upscale_factor=2),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=Monitor(checkpoints_dir=tmp_path / "dp", mode="min",
                            target="Loss", saved_freq=1, early_stop=0),
            num_epochs=3, patch=8, ratio=2, steps_per_epoch=8,
            mesh_axes={"data": 8},
        )

    trainer = make()
    trainer._ensure_initialized()
    trainer._ensure_buffers()
    # Buffers are sharded over the mesh (HBM capacity scales with chips).
    assert len(trainer.lr_buf.sharding.device_set) == 8
    assert trainer._step_batch == 2  # 16 global / 8 devices

    log1, _, _ = trainer._run_epoch("training", 1)
    log3 = None
    for e in (2, 3):
        log3, _, _ = trainer._run_epoch("training", e)
    assert np.isfinite(log1["Loss"]) and log3["Loss"] < log1["Loss"]

    # Deterministic across a rebuild (explicit key chain incl. device fold).
    trainer2 = make()
    trainer2._ensure_initialized()
    log1b, _, _ = trainer2._run_epoch("training", 1)
    assert abs(log1b["Loss"] - log1["Loss"]) < 1e-6


# ------------------------------------------------------------------
# 3D/4D volume device-epoch twins (VERDICT round-2 item #5): BASELINE
# configs #2/#3 train at device-epoch rates, checkpoints interoperate
# with the host-loop volume trainers.
# ------------------------------------------------------------------


def _vol_cfg(root, saved_dir, task, trainer_name, num_epochs=2,
             loaded_path=None):
    """task: '3d' (AcdcVolumeDataset/Volume3DSRNet) or '4d'."""
    if task == "3d":
        dataset = {"name": "AcdcVolumeDataset",
                   "kwargs": {"data_dir": str(root / "videos"),
                              "downscale_factor": 2,
                              "transforms": [
                                  {"name": "Normalize",
                                   "kwargs": {"means": [54.089], "stds": [48.084]}},
                                  {"name": "ToTensor"}]}}
        net = {"name": "Volume3DSRNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_resblocks": 1, "num_features": 4,
                          "upscale_factor": 2}}
        logger = "Acdc3DSRLogger"
    else:
        dataset = {"name": "AcdcVolumeVSRDataset",
                   "kwargs": {"data_dir": str(root / "videos"),
                              "downscale_factor": 2, "num_frames": 3,
                              "transforms": [
                                  {"name": "Normalize",
                                   "kwargs": {"means": [54.089], "stds": [48.084]}},
                                  {"name": "ToTensor"}]}}
        net = {"name": "Volume4DSRNet",
               "kwargs": {"in_channels": 1, "out_channels": 1,
                          "num_features": 4, "num_resblocks": 1,
                          "upscale_factor": 2}}
        logger = "Acdc4DSRLogger"
    cfg = {
        "main": {"random_seed": "vsr", "saved_dir": str(saved_dir)},
        "dataset": dataset,
        "dataloader": {"name": "Dataloader",
                       "kwargs": {"train_batch_size": 2, "valid_batch_size": 1,
                                  "shuffle": True, "num_workers": 0}},
        "net": net,
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [{"name": "PSNR"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3, "weight_decay": 0}},
        "logger": {"name": logger, "kwargs": {}},
        "monitor": {"name": "Monitor",
                    "kwargs": {"mode": "min", "target": "Loss",
                               "saved_freq": 1, "early_stop": 0}},
        "trainer": {"name": trainer_name,
                    "kwargs": {"num_epochs": num_epochs}},
    }
    if trainer_name.endswith("DeviceTrainer"):
        cfg["trainer"]["kwargs"].update(patch=8, ratio=2, steps_per_epoch=4)
    if loaded_path:
        cfg["main"]["loaded_path"] = str(loaded_path)
    return cfg


def _vol_tree(tmp_path):
    return make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=2, slices=2, frames=4,
                               hr_size=16)


def test_vol3d_device_trainer_cli_and_interop(tmp_path):
    root = _vol_tree(tmp_path)
    saved = tmp_path / "dev3d"
    path = tmp_path / "dev3d.yaml"
    _write_yaml(path, _vol_cfg(root, saved, "3d", "Acdc3DSRDeviceTrainer"))
    run_train(load_config(path))
    ckpt = saved / "checkpoints" / "model_2.ckpt"
    assert ckpt.exists()

    # Checkpoint interop: the HOST-loop volume trainer resumes from the
    # device-trainer checkpoint (same params/opt_state/monitor structures).
    saved_host = tmp_path / "host3d"
    path2 = tmp_path / "host3d.yaml"
    _write_yaml(path2, _vol_cfg(root, saved_host, "3d", "Acdc3DSRTrainer",
                                num_epochs=3, loaded_path=ckpt))
    run_train(load_config(path2))
    assert (saved_host / "checkpoints" / "model_3.ckpt").exists()


def test_vol4d_device_trainer_cli_and_interop(tmp_path):
    root = _vol_tree(tmp_path)
    saved = tmp_path / "dev4d"
    path = tmp_path / "dev4d.yaml"
    _write_yaml(path, _vol_cfg(root, saved, "4d", "Acdc4DSRDeviceTrainer"))
    run_train(load_config(path))
    ckpt = saved / "checkpoints" / "model_2.ckpt"
    assert ckpt.exists()

    saved_host = tmp_path / "host4d"
    path2 = tmp_path / "host4d.yaml"
    _write_yaml(path2, _vol_cfg(root, saved_host, "4d", "Acdc4DSRTrainer",
                                num_epochs=3, loaded_path=ckpt))
    run_train(load_config(path2))
    assert (saved_host / "checkpoints" / "model_3.ckpt").exists()


def test_vol_device_epoch_learns(tmp_path):
    """The 3D device epoch actually reduces the loss over a few epochs."""
    import ast as _ast
    import logging as _logging

    root = _vol_tree(tmp_path)
    saved = tmp_path / "learn3d"
    path = tmp_path / "learn3d.yaml"
    cfg = _vol_cfg(root, saved, "3d", "Acdc3DSRDeviceTrainer", num_epochs=5)
    cfg["trainer"]["kwargs"]["steps_per_epoch"] = 8
    _write_yaml(path, cfg)

    records = []

    class Cap(_logging.Handler):
        def emit(self, r):
            records.append(r.getMessage())

    h = Cap()
    _logging.getLogger().addHandler(h)
    _logging.getLogger().setLevel(_logging.INFO)
    try:
        run_train(load_config(path))
    finally:
        _logging.getLogger().removeHandler(h)
    trains = [_ast.literal_eval(m.split("Train log: ", 1)[1].rstrip("."))
              for m in records if "Train log: " in m]
    assert len(trains) == 5
    assert trains[-1]["Loss"] < trains[0]["Loss"]


def test_device_trainer_auto_scan_unroll(tmp_path):
    """The mixin unrolls the net's internal scan at the TRAINING size:
    frame-scan nets get the buffered window T, feedback nets their
    num_steps; explicit scan_unroll config and netted-out knobs win.
    (Exactness of unroll itself: test_models_feedback.py.)"""
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=6,
                               hr_size=16)
    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.datasets import AcdcVSRDataset
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.runner.device_trainer import AcdcVSRDeviceTrainer

    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]

    def build(net, **extra):
        train_ds = AcdcVSRDataset(data_dir=root / "videos", type="train",
                                  downscale_factor=2, transforms=transforms,
                                  num_frames=3)
        valid_ds = AcdcVSRDataset(data_dir=root / "videos", type="valid",
                                  downscale_factor=2, transforms=transforms,
                                  num_frames=3)
        return AcdcVSRDeviceTrainer(
            train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
            valid_dataloader=Dataloader(valid_ds, batch_size=1),
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
            monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                            target="Loss", saved_freq=1, early_stop=0),
            num_epochs=1, patch=8, ratio=2, steps_per_epoch=2, **extra)

    net = DRFNet(in_channels=1, out_channels=1, num_features=4, num_groups=1,
                 upscale_factor=2)
    # auto: the buffered window T=3
    t = build(net)
    t._ensure_buffers()
    assert t.net.unroll == 3
    # explicit int config
    t = build(net, scan_unroll=2)
    t._ensure_buffers()
    assert t.net.unroll == 2
    # off
    t = build(net, scan_unroll=1)
    t._ensure_buffers()
    assert t.net.unroll == 1
    # net-level knob already set -> respected
    t = build(net.clone(unroll=4))
    t._ensure_buffers()
    assert t.net.unroll == 4
    # and the unrolled trainer still trains end to end
    t = build(net)
    t.train()
