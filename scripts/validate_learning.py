"""End-to-end learning validation on TPU.

Trains a small EDSR x2 on synthetic cardiac-like images degraded with the
real k-space truncation operator and verifies the trained model beats the
bicubic baseline on held-out data — evidence that degradation, training,
metrics, and inference compose correctly (the closest available stand-in for
the ACDC-val parity run, since the real dataset is not present in this
environment).

Run: python scripts/validate_learning.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_images(n: int, size: int, seed: int) -> np.ndarray:
    """Cardiac-like images: smooth anatomy blobs + a bright ring + noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:size, :size].astype(np.float64)
    out = np.zeros((n, size, size), np.float32)
    for i in range(n):
        img = np.zeros((size, size))
        for _ in range(6):
            cy, cx = rng.uniform(10, size - 10, 2)
            s = rng.uniform(20, 200)
            a = rng.uniform(30, 120)
            img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / s)
        # ventricle-like ring
        cy, cx = rng.uniform(30, size - 30, 2)
        r = rng.uniform(8, 16)
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        img += 120 * np.exp(-((d - r) ** 2) / 6.0)
        img += rng.normal(0, 3, (size, size))
        out[i] = np.clip(img, 0, 255).round()
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SSIM
    from vsr_tpu.models import Bicubic, EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer
    from vsr_tpu.utils.normalize import DATASET_STATS

    # --seed N offsets the data seeds (same shapes -> compile-cache hits);
    # --bf16 trains the SHIPPED device-config dtype policy — together they
    # give the multi-seed dtype table BENCH.md's round-4 lesson demands
    # (single-seed dtype A/Bs mislead; report mean + worst).
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    use_bf16 = "--bf16" in sys.argv
    dtype = jnp.bfloat16 if use_bf16 else None

    mean, std = DATASET_STATS["acdc"]
    size, factor = 96, 2
    hr_train = synth_images(256, size, seed=seed * 100)
    hr_val = synth_images(32, size, seed=seed * 100 + 1)

    degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
    lr_train = np.asarray(degrade(hr_train))
    lr_val = np.asarray(degrade(hr_val))

    psnr, ssim = PSNR(), SSIM()

    # Bicubic baseline.
    bicubic = Bicubic(upscale_factor=factor)
    sr_bi = np.asarray(bicubic.apply({}, jnp.asarray(lr_val[..., None])))
    sr_bi = np.clip(np.round(sr_bi), 0, 255)
    base_psnr = float(psnr(sr_bi, hr_val[..., None]))
    base_ssim = float(ssim(sr_bi, hr_val[..., None]))
    print(f"bicubic baseline: PSNR {base_psnr:.3f} dB, SSIM {base_ssim:.4f}")

    # Train EDSR with the on-device trainer.
    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                  num_features=32, upscale_factor=factor, dtype=dtype)
    trainer = DeviceEpochTrainer(
        net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=2e-4),
        lr_data=lr_train[..., None],
        hr_data=hr_train[..., None],
        batch_size=16, patch=32, ratio=factor, steps_per_epoch=50,
    )
    t0 = time.time()
    for epoch in range(40):
        log = trainer.train_epoch()
    print(f"trained 2000 steps in {time.time() - t0:.1f}s, final loss {log['Loss']:.4f}")

    # Evaluate: full-image inference with the trained params.
    @jax.jit
    def infer(params, lr_imgs):
        z = (lr_imgs - mean) / (std + 1e-10)
        sr = net.apply(params, z[..., None]).astype(jnp.float32)
        return jnp.clip(jnp.round(sr * std + mean), 0, 255)

    sr = np.asarray(infer(trainer.params, jnp.asarray(lr_val)))
    model_psnr = float(psnr(sr, hr_val[..., None]))
    model_ssim = float(ssim(sr, hr_val[..., None]))
    print(f"trained EDSR:     PSNR {model_psnr:.3f} dB, SSIM {model_ssim:.4f}")
    gain = model_psnr - base_psnr
    print(f"gain over bicubic: {gain:+.3f} dB")
    print(f"RESULT seed={seed} dtype={'bf16' if use_bf16 else 'f32'} "
          f"psnr={model_psnr:.3f} gain={gain:+.3f}")
    assert gain > 0.3, "trained model should beat bicubic by a clear margin"
    print("LEARNING VALIDATION: OK")


if __name__ == "__main__":
    main()
