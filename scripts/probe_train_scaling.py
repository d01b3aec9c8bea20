"""Probe: device-epoch training throughput vs batch/patch size (one chip).

The headline training figure (bench.py) is EDSR-16/64, batch 16 of 32->64
patches — the reference's own training configuration. This probe asks
whether the TPU is actually saturated there: it sweeps batch size and patch
size, reports steps/s, samples/s, and the implied conv TFLOP/s, and answers
where the knee is. Run: python scripts/probe_train_scaling.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((512, 96, 96, 1)) * 255).astype(np.float32)
    lrbuf = hrbuf[:, ::2, ::2]

    net = EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                  num_features=64, upscale_factor=2, dtype=jnp.bfloat16)

    for batch, patch in [(16, 32), (32, 32), (64, 32), (128, 32),
                         (16, 48), (64, 48)]:
        trainer = DeviceEpochTrainer(
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=optax.adam(1e-4), lr_data=lrbuf, hr_data=hrbuf,
            batch_size=batch, patch=patch, ratio=2, steps_per_epoch=200,
        )
        t0 = time.time()
        trainer.train_epoch()  # warm/compile
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        n_epochs = 3
        for _ in range(n_epochs):
            trainer.train_epoch()
        dt = time.perf_counter() - t0
        steps_s = n_epochs * 200 / dt
        # EDSR fwd conv FLOPs per LR pixel: head+tail thin, body 16 blocks x
        # 2 convs x (2*9*64*64) + skip/up convs ~= 1.22 MFLOP/px; bwd ~2x.
        flops_px = (2 * 9 * 64 * 64) * (2 * 16 + 2) + 2 * 9 * 64 * (1 + 4)
        tflops = 3 * flops_px * patch * patch * batch * steps_s / 1e12
        print(f"batch {batch:4d} patch {patch}: {steps_s:7.1f} steps/s "
              f"({steps_s * batch:8.0f} samples/s, ~{tflops:5.1f} TFLOP/s "
              f"fwd+bwd)  [compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
