"""Steady-state training-throughput A/B: f32 vs bf16 vs hybrid (carry_f32).

Production-shaped DRFNet (F=64, groups=6, unroll=5) and FRVSR device-epoch
trainers; whole-epoch device scans (one dispatch, one readback per epoch —
the trusted bench.py timing pattern). Quality companion:
``validate_vsr_learning.py [--bf16 [--carry-f32]]``.

Run: python scripts/probe_carry_f32_training.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = 50


def _build_drf(dtype, carry_f32=False):
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    return DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=64,
                   num_groups=6, upscale_factor=2, unroll=5, dtype=dtype,
                   carry_f32=carry_f32),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2,
        steps_per_epoch=STEPS)


def _build_frvsr(dtype, carry_f32=False):
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import FRVSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    return DeviceEpochTrainer(
        net=FRVSRNet(in_channels=1, out_channels=1, upscale_factor=2,
                     num_resblocks=10, unroll=5, dtype=dtype,
                     carry_f32=carry_f32),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2,
        steps_per_epoch=STEPS)


def measure(name: str, trainer) -> float:
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    cache = (f"/tmp/vsr_tpu_jax_cache_{backend}" if backend != "cpu"
             else "/tmp/vsr_tpu_jax_cache_cpu_probe_carry")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for tag, build in [("DRFNet-64/6", _build_drf),
                       ("FRVSR-10", _build_frvsr)]:
        f32 = measure(f"{tag} f32", build(None))
        bf16 = measure(f"{tag} bf16", build(jnp.bfloat16))
        hyb = measure(f"{tag} bf16+carry_f32", build(jnp.bfloat16, True))
        print(f"{tag}: bf16 {bf16 / f32:.2f}x f32, hybrid {hyb / f32:.2f}x "
              f"f32 ({hyb / bf16:.2f}x bf16)", flush=True)


if __name__ == "__main__":
    main()
