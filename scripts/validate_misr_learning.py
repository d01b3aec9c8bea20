"""MISR (DUFNet) learning validation on TPU.

Synthetic cine sequences (the same beating-ring phantoms as the VSR
validation), real k-space x2 degradation, DUFNet trained on 7-frame windows
-> center HR frame via the device-epoch trainer (exercises the BatchNorm
state threading of the config-driven DeviceTrainerMixin); center-frame PSNR
on held-out sequences must beat bicubic.

Run: python scripts/validate_misr_learning.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from validate_vsr_learning import synth_sequences  # noqa: E402


class _MemMISRDataset:
    """In-memory MISR windows with the dataset attributes the device trainer
    stacks through (transforms/augments are swapped out during stacking)."""

    def __init__(self, lr_windows: np.ndarray, hr_centers: np.ndarray):
        from vsr_tpu.data.transforms import compose

        self.lr = lr_windows
        self.hr = hr_centers
        self.transforms = compose(None)
        self.augments = lambda *imgs, rng=None: imgs
        self.type = "train"

    def __getitem__(self, index: int, rng=None):
        lr, hr = self.augments(self.lr[index], self.hr[index], rng=rng)
        lr, hr = self.transforms(lr, hr)
        return {"lr_imgs": lr, "hr_img": hr, "index": index}

    def __len__(self) -> int:
        return len(self.lr)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.data.datasets import misr_target_index
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import HuberLoss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import Bicubic, DUFNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import AcdcMISRDeviceTrainer
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    size, factor, win = 96, 2, 7
    t_frames = 12
    hr_train = synth_sequences(48, size, t_frames, seed=0)
    hr_val = synth_sequences(8, size, t_frames, seed=1)

    degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
    lr_train = np.asarray(degrade(hr_train.reshape(-1, size, size))).reshape(
        48, t_frames, size // factor, size // factor)
    lr_val = np.asarray(degrade(hr_val.reshape(-1, size, size))).reshape(
        8, t_frames, size // factor, size // factor)

    center = misr_target_index(win)

    def windows(lr, hr):
        n, t = lr.shape[:2]
        lws, hcs = [], []
        for i in range(n):
            for ti in range(t):
                idx = [(ti - center + k) % t for k in range(win)]
                lws.append(lr[i, idx])
                hcs.append(hr[i, ti])
        return np.stack(lws)[..., None], np.stack(hcs)[..., None]

    lw, hc = windows(lr_train, hr_train)
    print("window buffers:", lw.shape, hc.shape)

    psnr = PSNR()
    bicubic = Bicubic(upscale_factor=factor)
    lv, hv = windows(lr_val, hr_val)
    centers_lr = lv[:, center]  # (M, h, w, 1)
    sr_bi = np.asarray(bicubic.apply({}, jnp.asarray(centers_lr)))
    base = float(psnr(np.clip(np.round(sr_bi), 0, 255), hv))
    print(f"bicubic center-frame PSNR: {base:.3f} dB")

    net = DUFNet(in_channels=1, out_channels=1, num_frames=win, size_filter=5,
                 upscale_factor=factor, backbone="_DenseLayer16")
    trainer = AcdcMISRDeviceTrainer(
        train_dataloader=Dataloader(_MemMISRDataset(lw, hc), batch_size=8,
                                    shuffle=True),
        valid_dataloader=None,
        net=net, loss_fns=[HuberLoss(delta=0.01)], loss_weights=[1.0],
        metric_fns=[], optimizer=Adam(lr=5e-4), lr_scheduler=None,
        logger=None, monitor=None, num_epochs=20,
        patch=24, ratio=factor, steps_per_epoch=50,
    )
    trainer._ensure_initialized()
    t0 = time.time()
    log = None
    for e in range(1, 21):
        log, _, _ = trainer._run_epoch("training", e)
        if e in (1, 5, 10, 20):
            print(f"epoch {e}: loss {log['Loss']:.5f} "
                  f"({time.time() - t0:.1f}s elapsed)")
    print(f"1000 steps in {time.time() - t0:.1f}s, final loss {log['Loss']:.5f}")

    @jax.jit
    def infer(variables, lr_windows):
        z = (lr_windows - mean) / (std + 1e-10)
        sr = net.apply(variables, z, train=False)
        return jnp.clip(jnp.round(sr * std + mean), 0, 255)

    # Batched inference over the val windows.
    sr = np.concatenate([
        np.asarray(infer(trainer.params, jnp.asarray(lv[i:i + 8])))
        for i in range(0, len(lv), 8)
    ])
    model = float(psnr(sr, hv))
    print(f"trained DUFNet center-frame PSNR: {model:.3f} dB "
          f"({model - base:+.3f} dB vs bicubic)")
    assert model - base > 0.3
    print("MISR LEARNING VALIDATION: OK")


if __name__ == "__main__":
    main()
