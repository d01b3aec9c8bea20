"""W8A8 quality validation at the bench scale, on the chip.

Trains the bench's EDSR-16/64 x2 on synthetic cardiac-like images (the
validate_learning.py recipe), then scores held-out PSNR/SSIM for every
serving precision the framework offers:

    fp32  |  bf16 (shipped serving dtype)  |  int8 weights  |
    W8A8 static (calibrated)  |  W8A8 dynamic

so the 1.34x W8A8 serving speedup (scripts/probe_w8a8_serving.py) carries a
measured quality delta on a TRAINED net, not just the random-weight PSNR of
the probe and the briefly-trained gate in tests/test_quantize.py.

Run: python scripts/validate_w8a8_quality.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_learning import synth_images  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.metrics import PSNR, SSIM
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import (calibrate_w8a8, make_quantized_apply,
                                  make_w8a8_apply, quantize_params)
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    size, factor = 96, 2
    hr_train = synth_images(256, size, seed=0)
    hr_val = synth_images(32, size, seed=1)

    degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
    lr_train = np.asarray(degrade(hr_train))
    lr_val = np.asarray(degrade(hr_val))

    kw = dict(in_channels=1, out_channels=1, num_resblocks=16,
              num_features=64, upscale_factor=factor)
    net = EDSRNet(**kw)
    trainer = DeviceEpochTrainer(
        net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=Adam(lr=2e-4),
        lr_data=lr_train[..., None], hr_data=hr_train[..., None],
        batch_size=16, patch=32, ratio=factor, steps_per_epoch=50,
    )
    t0 = time.time()
    for _ in range(40):
        log = trainer.train_epoch()
    print(f"trained 2000 steps in {time.time() - t0:.1f}s, "
          f"final loss {log['Loss']:.4f}", flush=True)
    params = trainer.params

    psnr, ssim = PSNR(), SSIM()
    z_val = jnp.asarray(((lr_val - mean) / (std + 1e-10))[..., None])

    def score(apply_fn, label, base=None):
        sr = np.asarray(jax.jit(apply_fn)(z_val), np.float32)
        sr = np.clip(np.round(sr * std + mean), 0, 255)
        p = float(psnr(sr, hr_val[..., None]))
        s = float(ssim(sr, hr_val[..., None]))
        delta = "" if base is None else f"  (delta {p - base:+.4f} dB)"
        print(f"{label:22s} PSNR {p:.4f} dB, SSIM {s:.5f}{delta}", flush=True)
        return p

    base = score(lambda z: net.apply(params, z), "fp32")

    bnet = EDSRNet(**kw, dtype=jnp.bfloat16)
    score(lambda z: bnet.apply(params, z).astype(jnp.float32),
          "bf16 (shipped)", base)

    qparams, scales = quantize_params(params)
    score(make_quantized_apply(net, qparams, scales), "int8 weights", base)

    cal = calibrate_w8a8(bnet, params, [z_val])
    p_stat = score(
        lambda z: make_w8a8_apply(bnet, params, act_scales=cal)(z)
        .astype(jnp.float32), f"W8A8 static ({len(cal)} convs)", base)
    score(lambda z: make_w8a8_apply(bnet, params)(z).astype(jnp.float32),
          "W8A8 dynamic", base)

    assert abs(base - p_stat) < 0.1, (base, p_stat)
    print("W8A8 QUALITY VALIDATION: OK (static within 0.1 dB of fp32)")


if __name__ == "__main__":
    main()
