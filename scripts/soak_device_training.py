"""Round-2 TPU soak: the PRODUCTION training path at length.

Flagship DRFNet through the config-driven AcdcVSRDeviceTrainer: 4000
device-epoch steps with per-epoch bucketed whole-sequence validation
(variable T in {9, 12, 14} -> one compiled eval program), Monitor
best-checkpointing, NaN watch.

Run: python scripts/soak_device_training.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from validate_misr_learning import _MemMISRDataset  # noqa: E402
from validate_vsr_learning import synth_sequences  # noqa: E402


class _MemVSRDataset(_MemMISRDataset):
    def __getitem__(self, index: int, rng=None):
        lr, hr = self.augments(self.lr[index], self.hr[index], rng=rng)
        lr, hr = self.transforms(lr, hr)
        return {"lr_imgs": lr, "hr_imgs": hr, "index": index}


class _MemWholeSeqDataset:
    """Whole variable-T sequences (pre-normalized) for the valid loader."""

    def __init__(self, pairs):
        self.pairs = pairs

    def __getitem__(self, index: int, rng=None):
        lr, hr = self.pairs[index]
        return {"lr_imgs": lr, "hr_imgs": hr, "index": index}

    def __len__(self):
        return len(self.pairs)


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.callbacks.monitor import Monitor
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import DRFNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import AcdcVSRDeviceTrainer
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    size, factor, win = 96, 2, 5

    degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))

    # Train: fixed 5-frame windows (raw [0,255]; the device trainer
    # normalizes on device).
    hr_tr = synth_sequences(48, size, 12, seed=0)
    lr_tr = np.asarray(degrade(hr_tr.reshape(-1, size, size))).reshape(
        48, 12, size // factor, size // factor)
    lws, hws = [], []
    for i in range(48):
        for t in range(12):
            idx = [(t - win + 1 + k) % 12 for k in range(win)]
            lws.append(lr_tr[i, idx])
            hws.append(hr_tr[i, idx])
    train_ds = _MemVSRDataset(np.stack(lws)[..., None], np.stack(hws)[..., None])

    # Valid: whole sequences of VARIABLE length (normalized), exercising the
    # bucketed masked eval through the trainer.
    pairs = []
    for j, t_len in enumerate([9, 12, 14, 9, 12, 14]):
        hr = synth_sequences(1, size, t_len, seed=100 + j)[0]
        lr = np.asarray(degrade(hr)).astype(np.float32)
        norm = lambda x: (x - mean) / (std + 1e-10)
        pairs.append((norm(lr)[..., None], norm(hr)[..., None]))
    valid_ds = _MemWholeSeqDataset(pairs)

    trainer = AcdcVSRDeviceTrainer(
        train_dataloader=Dataloader(train_ds, batch_size=8, shuffle=True),
        valid_dataloader=Dataloader(valid_ds, batch_size=1),
        net=DRFNet(in_channels=1, out_channels=1, num_features=32,
                   num_groups=3, upscale_factor=factor,
                   num_experts=4 if __import__("os").environ.get(
                       "SOAK_MOE") else 0, expert_group_size=64),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[PSNR()],
        optimizer=Adam(lr=2e-4), lr_scheduler=None, logger=None,
        monitor=Monitor(checkpoints_dir=Path("/tmp/vsr_soak_ckpt"),
                        mode="min", target="Loss", saved_freq=10,
                        early_stop=0),
        num_epochs=int(__import__("os").environ.get("SOAK_EPOCHS", 20)), patch=24, ratio=factor, steps_per_epoch=200,
        t_bucket=8,
    )
    t0 = time.time()
    trainer.train()
    dt = time.time() - t0
    n = trainer.num_epochs
    print(f"{n} epochs x 200 steps = {n * 200} steps + {n} bucketed valid "
          f"epochs in {dt:.1f}s ({n * 200 / dt:.0f} steps/s incl. validation)")

    leaves = jax.tree_util.tree_leaves(trainer.params)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves), "non-finite params"
    assert (Path("/tmp/vsr_soak_ckpt") / "model_best.ckpt").exists()
    print("SOAK OK (params finite, best checkpoint written)")


if __name__ == "__main__":
    main()
