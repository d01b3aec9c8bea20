"""A/B mixed-precision (bf16-compute) device-epoch TRAINING vs f32.

The flagship training trace (scripts/profile_train_step.py) showed every
major non-conv residue HBM-bound (PReLU backward 659 GB/s, squeeze convs
765, concat 576) — bf16 activations halve those bytes.  bench.py's
training figure already runs ``dtype=jnp.bfloat16``; the SHIPPED device
configs train f32-compute.  This probe measures both sides of that gap:

1. throughput: steps/s for EDSR-16/64 (the shipped
   acdc_sisr_edsr_x2_device.yaml geometry incl. fused_tail) and the
   flagship DRFNet-6x64, f32 vs bf16 compute (params/optimizer stay f32
   master copies either way — flax ``dtype`` only casts compute);
2. quality: the validate_learning.py protocol (EDSR-8/32, 2000 steps on
   synthetic cardiac images, real k-space x2 degradation) trained f32 vs
   bf16, held-out PSNR/SSIM compared.

Timing: whole-epoch device scans (one dispatch, one readback per epoch) —
the trusted pattern from bench.py; distinct sampling RNG per epoch.

Run: python scripts/probe_bf16_training.py [--quality-only|--speed-only]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50


def _build_edsr(dtype):
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((256, 64, 64, 1)) * 255).astype(np.float32)
    return DeviceEpochTrainer(
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                    num_features=64, upscale_factor=2, fused_tail=True,
                    dtype=dtype),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, ::2, ::2],
        hr_data=hrbuf, batch_size=16, patch=32, ratio=2,
        steps_per_epoch=STEPS)


def _build_drf(dtype):
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    return DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=64,
                   num_groups=6, upscale_factor=2, unroll=5, dtype=dtype),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2,
        steps_per_epoch=STEPS)


def measure(name: str, build, dtype) -> float:
    trainer = build(dtype)
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.train_epoch()
        best = max(best, STEPS / (time.perf_counter() - t0))
    print(f"{name:34s} {best:7.1f} steps/s   (compile {compile_s:.0f} s)",
          flush=True)
    return best


def quality(dtype) -> tuple[float, float]:
    """validate_learning.py protocol, parameterized by compute dtype."""
    import jax
    import jax.numpy as jnp

    from validate_learning import synth_images

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SSIM
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    size, factor = 96, 2
    hr_train = synth_images(256, size, seed=0)
    hr_val = synth_images(32, size, seed=1)
    degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
    lr_train = np.asarray(degrade(hr_train))
    lr_val = np.asarray(degrade(hr_val))

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                  num_features=32, upscale_factor=factor, dtype=dtype)
    trainer = DeviceEpochTrainer(
        net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=2e-4), lr_data=lr_train[..., None],
        hr_data=hr_train[..., None], batch_size=16, patch=32, ratio=factor,
        steps_per_epoch=50)
    for _ in range(40):
        log = trainer.train_epoch()

    @jax.jit
    def infer(params, lr_imgs):
        z = (lr_imgs - mean) / (std + 1e-10)
        sr = net.apply(params, z[..., None]).astype(jnp.float32)
        return jnp.clip(jnp.round(sr * std + mean), 0, 255)

    sr = np.asarray(infer(trainer.params, jnp.asarray(lr_val)))
    p = float(PSNR()(sr, hr_val[..., None]))
    s = float(SSIM()(sr, hr_val[..., None]))
    print(f"  dtype={dtype}: final loss {log['Loss']:.4f}, "
          f"held-out PSNR {p:.3f} dB, SSIM {s:.4f}", flush=True)
    return p, s


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend={jax.default_backend()}", flush=True)

    if "--quality-only" not in sys.argv:
        for label, build in [("EDSR-16/64 (shipped config)", _build_edsr),
                             ("DRFNet-6x64 (flagship)", _build_drf)]:
            f32 = measure(f"{label} f32", build, None)
            bf16 = measure(f"{label} bf16", build, jnp.bfloat16)
            print(f"    -> bf16 = {bf16 / f32:.2f}x f32", flush=True)

    if "--speed-only" not in sys.argv:
        print("learning quality (validate_learning protocol):", flush=True)
        pf, sf = quality(None)
        pb, sb = quality(jnp.bfloat16)
        print(f"    -> bf16 PSNR delta {pb - pf:+.3f} dB, "
              f"SSIM delta {sb - sf:+.4f}", flush=True)


if __name__ == "__main__":
    main()
