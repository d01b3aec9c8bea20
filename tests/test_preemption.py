"""Graceful preemption: SIGTERM mid-training checkpoints at a batch boundary
and the run resumes at the interrupted epoch (reference has no preemption
story — recovery there is manual loaded_path)."""

import os
import signal
import threading

import numpy as np

from tests.synth import make_processed_tree
from vsr_tpu.callbacks.monitor import Monitor
from vsr_tpu.data.datasets import AcdcSISRDataset
from vsr_tpu.data.loader import Dataloader
from vsr_tpu.losses import L1Loss
from vsr_tpu.metrics import PSNR
from vsr_tpu.models import EDSRNet
from vsr_tpu.optim import Adam
from vsr_tpu.runner.trainers import AcdcSISRTrainer
from vsr_tpu.utils.recovery import find_latest_checkpoint

TRANSFORMS = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


def _make_trainer(root, tmp_path, num_epochs):
    train_ds = AcdcSISRDataset(data_dir=root / "imgs", type="train",
                               downscale_factor=2, transforms=TRANSFORMS)
    valid_ds = AcdcSISRDataset(data_dir=root / "imgs", type="valid",
                               downscale_factor=2, transforms=TRANSFORMS)
    return AcdcSISRTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=2, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                    num_features=4, upscale_factor=2),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=1e-3), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=tmp_path / "ckpt", mode="min",
                        target="Loss", saved_freq=100, early_stop=0),
        num_epochs=num_epochs, prefetch_to_device=False,
    )


def test_sigterm_checkpoints_and_resumes(tmp_path):
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=2, frames=6,
                               hr_size=16)
    trainer = _make_trainer(root, tmp_path, num_epochs=2000)

    # Deliver a real SIGTERM shortly after training starts.
    timer = threading.Timer(2.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    old = signal.getsignal(signal.SIGTERM)
    try:
        trainer.train()
    finally:
        timer.cancel()
        signal.signal(signal.SIGTERM, old)

    assert trainer._preempted
    assert trainer.epoch < 2000  # stopped early, not ran to completion
    ckpt = tmp_path / "ckpt" / "model_preempt.ckpt"
    assert ckpt.exists()
    # auto-resume picks the preemption checkpoint.
    assert find_latest_checkpoint(tmp_path / "ckpt") == ckpt

    interrupted = trainer.epoch
    resumed = _make_trainer(root, tmp_path, num_epochs=interrupted + 1)
    resumed.load(ckpt)
    # The interrupted epoch counts as done (its partial updates are in the
    # params); resume continues at the NEXT epoch, never re-applying them.
    assert resumed.epoch == interrupted + 1
    resumed.train()
    assert not resumed._preempted
    finite = all(np.isfinite(np.asarray(l)).all()
                 for l in __import__("jax").tree_util.tree_leaves(resumed.params))
    assert finite


def test_preempt_flag_checkpoints_without_signal(tmp_path):
    """The flag alone (e.g. an orchestration hook) triggers the same path."""
    root = make_processed_tree(tmp_path / "data", types=("train", "valid"),
                               patients_per_type=1, slices=1, frames=4,
                               hr_size=16)
    trainer = _make_trainer(root, tmp_path, num_epochs=5)
    trainer._ensure_initialized()
    trainer._preempted = True
    trainer._train_loop()
    assert (tmp_path / "ckpt" / "model_preempt.ckpt").exists()
