"""3D/4D volume DEVICE-trainer learning validation on TPU (round 3).

Completes the BASELINE configs #2/#3 evidence for the device-epoch twins
(Acdc3DSRDeviceTrainer / Acdc4DSRDeviceTrainer): synthetic cine phantoms
stacked into (H, W, D, T) volumes, real k-space x2 degradation per frame,
a few hundred device-epoch steps through the CONFIG-DRIVEN trainer classes
(HBM-resident volume buffers, on-device paired crops with depth untouched),
held-out volume PSNR must beat bicubic.

Run: python scripts/validate_vol_learning.py [3d|4d] [--bf16]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from validate_vsr_learning import synth_sequences  # noqa: E402

SIZE, FACTOR, DDEPTH, TFRAMES = 96, 2, 4, 8
WIN = 4  # 4D training window


def make_volumes(n: int, seed: int):
    """(N, T, D, H, W) HR volumes: per-depth cine phantoms (slightly
    decorrelated across depth, like adjacent short-axis slices)."""
    vols = np.stack(
        [synth_sequences(n, SIZE, TFRAMES, seed=seed * 131 + d)
         for d in range(DDEPTH)], axis=2)  # (N, T, D, H, W)
    return vols


def main(which: list[str]) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.data.transforms import compose
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import Bicubic
    from vsr_tpu.models.vol3d import Volume3DSRNet
    from vsr_tpu.models.vol4d import Volume4DSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import (Acdc3DSRDeviceTrainer,
                                               Acdc4DSRDeviceTrainer)
    from vsr_tpu.utils.normalize import DATASET_STATS

    bf16 = "--bf16" in which
    which = [w for w in which if w != "--bf16"]
    # --seed N offsets the data seeds (multi-seed re-validation of the
    # shipped vol3d bf16 policy — BENCH.md round-4 lesson).
    seed = 0
    if "--seed" in which:
        i = which.index("--seed")
        seed = int(which[i + 1])
        del which[i:i + 2]
    dtype = jnp.bfloat16 if bf16 else None
    if bf16:
        print("mixed precision: bf16 compute, f32 master params", flush=True)

    mean, std = DATASET_STATS["acdc"]
    hr_train = make_volumes(16, seed=seed * 1000)  # (16, T, D, H, W)
    hr_val = make_volumes(4, seed=seed * 1000 + 1)

    degrade = jax.jit(lambda x: kspace_downscale_jax(x, FACTOR))
    lo = SIZE // FACTOR

    def deg(v):
        flat = v.reshape(-1, SIZE, SIZE)
        return np.asarray(degrade(flat)).reshape(*v.shape[:-2], lo, lo)

    lr_train, lr_val = deg(hr_train), deg(hr_val)

    psnr = PSNR()
    bicubic = Bicubic(upscale_factor=FACTOR)
    sr_bi = np.asarray(bicubic.apply(
        {}, jnp.asarray(lr_val.reshape(-1, lo, lo)[..., None])))
    base = float(psnr(np.clip(np.round(sr_bi), 0, 255),
                      hr_val.reshape(-1, SIZE, SIZE)[..., None]))
    print(f"bicubic per-frame PSNR: {base:.3f} dB", flush=True)

    class _MemDataset:
        """Transform-layout in-memory dataset for the config trainers."""

        def __init__(self, samples):  # list of dicts
            self.samples = samples
            self.transforms = compose(None)
            self.augments = lambda *imgs, rng=None: imgs
            self.type = "train"

        def __getitem__(self, index, rng=None):
            return {**self.samples[index], "index": index}

        def __len__(self):
            return len(self.samples)

    common = dict(
        valid_dataloader=None, loss_fns=[L1Loss()], loss_weights=[1.0],
        metric_fns=[], lr_scheduler=None, logger=None, monitor=None,
        num_epochs=1, patch=24, ratio=FACTOR,
    )

    if not which or "3d" in which:
        # 3D: one (H, W, D, C) volume per (patient, frame).
        samples = [
            {"lr_vol": np.moveaxis(lr_train[i, t], 0, -1)[..., None],
             "hr_vol": np.moveaxis(hr_train[i, t], 0, -1)[..., None]}
            for i in range(hr_train.shape[0]) for t in range(TFRAMES)
        ]
        net3 = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=4,
                             num_features=16, upscale_factor=FACTOR,
                             dtype=dtype)
        tr = Acdc3DSRDeviceTrainer(
            train_dataloader=Dataloader(_MemDataset(samples), batch_size=8),
            net=net3, optimizer=Adam(lr=3e-4), steps_per_epoch=50, **common)
        tr._ensure_initialized()
        t0 = time.time()
        for e in range(20):
            log, _, _ = tr._run_epoch("training", e + 1)
        print(f"3D: 1000 steps in {time.time() - t0:.1f}s, "
              f"final loss {log['Loss']:.4f}", flush=True)

        @jax.jit
        def infer3(params, lr_vols):  # (B, D, h, w, 1)
            z = (lr_vols - mean) / (std + 1e-10)
            sr = net3.apply(params, z).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * std + mean), 0, 255)

        lrv = lr_val.reshape(-1, DDEPTH, lo, lo)[..., None]
        sr = np.asarray(infer3(tr.params, jnp.asarray(lrv)))
        model = float(psnr(sr.reshape(-1, SIZE, SIZE, 1),
                           hr_val.reshape(-1, SIZE, SIZE)[..., None]))
        print(f"3D Volume3DSRNet PSNR: {model:.3f} dB "
              f"({model - base:+.3f} dB vs bicubic)", flush=True)
        print(f"RESULT seed={seed} task=3d dtype={'bf16' if bf16 else 'f32'} "
              f"psnr={model:.3f} gain={model - base:+.3f}", flush=True)
        assert model - base > 0.3
        print("3D VOLUME DEVICE-TRAINER LEARNING: OK", flush=True)

    if not which or "4d" in which:
        # 4D: WIN-frame circular windows of volumes, transform layout
        # (T, H, W, D, C).
        samples = []
        for i in range(hr_train.shape[0]):
            for t in range(TFRAMES):
                idx = [(t - WIN + 1 + k) % TFRAMES for k in range(WIN)]
                samples.append({
                    "lr_vols": np.moveaxis(lr_train[i, idx], 1, -1)[..., None],
                    "hr_vols": np.moveaxis(hr_train[i, idx], 1, -1)[..., None],
                })
        net4 = Volume4DSRNet(in_channels=1, out_channels=1, num_features=16,
                             num_resblocks=2, upscale_factor=FACTOR,
                             dtype=dtype)
        tr = Acdc4DSRDeviceTrainer(
            train_dataloader=Dataloader(_MemDataset(samples), batch_size=4),
            net=net4, optimizer=Adam(lr=3e-4), steps_per_epoch=50, **common)
        tr._ensure_initialized()
        t0 = time.time()
        for e in range(16):
            log, _, _ = tr._run_epoch("training", e + 1)
        print(f"4D: 800 steps in {time.time() - t0:.1f}s, "
              f"final loss {log['Loss']:.4f}", flush=True)

        @jax.jit
        def infer4(params, lr_seqs):  # (B, T, D, h, w, 1)
            z = (lr_seqs - mean) / (std + 1e-10)
            sr = net4.apply(params, z).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * std + mean), 0, 255)

        lrv = lr_val[..., None]  # (4, T, D, lo, lo, 1)
        sr = np.asarray(infer4(tr.params, jnp.asarray(lrv)))
        model = float(psnr(sr.reshape(-1, SIZE, SIZE, 1),
                           hr_val.reshape(-1, SIZE, SIZE)[..., None]))
        print(f"4D Volume4DSRNet PSNR: {model:.3f} dB "
              f"({model - base:+.3f} dB vs bicubic)", flush=True)
        print(f"RESULT seed={seed} task=4d dtype={'bf16' if bf16 else 'f32'} "
              f"psnr={model:.3f} gain={model - base:+.3f}", flush=True)
        assert model - base > 0.3
        print("4D VOLUME DEVICE-TRAINER LEARNING: OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
