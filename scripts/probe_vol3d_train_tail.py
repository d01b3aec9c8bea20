"""vol3d training A/B: fused_tail (folded final conv) on the device-epoch
trainer — companion to probe_vol4d_train_tail.py (vol4d measured +30%).

Run (chip): python scripts/probe_vol3d_train_tail.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = 50


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import Volume3DSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((64, 8, 48, 48, 1)) * 255).astype(np.float32)
    lrbuf = hrbuf[:, :, ::2, ::2]

    for tag, kw in [("plain", {}), ("fused", {"fused_tail": True})]:
        trainer = DeviceEpochTrainer(
            net=Volume3DSRNet(in_channels=1, out_channels=1, num_features=32,
                              num_resblocks=8, upscale_factor=2,
                              dtype=jnp.bfloat16, **kw),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=optax.adam(1e-4), lr_data=lrbuf, hr_data=hrbuf,
            batch_size=8, patch=24, ratio=2, steps_per_epoch=STEPS)
        trainer.train_epoch()
        t0 = time.perf_counter()
        trainer.train_epoch()
        trainer.train_epoch()
        dt = (time.perf_counter() - t0) / 2
        print(f"{tag}: {STEPS / dt:7.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
