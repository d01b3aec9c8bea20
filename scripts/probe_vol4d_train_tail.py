"""Does the vol4d serving tail lesson transfer to TRAINING?

hoist_tail/fused_tail are pure program-structure changes (identical
function, identical param tree — tests/test_vol4d.py), so gradients are
identical too and either can be enabled for training via the net kwarg.
This A/Bs device-epoch steps/s at the round-4 training protocol
(probe_carry_f32_training shapes: T=5 windows, D=8, 24^2 LR patches).

Run (chip): python scripts/probe_vol4d_train_tail.py
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
    from vsr_tpu.models import Volume4DSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((32, 5, 8, 48, 48, 1)) * 255).astype(
        np.float32)
    lrbuf = hrbuf[:, :, :, ::2, ::2]

    for tag, kw in [("plain", {}),
                    ("hoist", {"hoist_tail": True}),
                    ("hoist+fused", {"hoist_tail": True, "fused_tail": True}),
                    ("fused", {"fused_tail": True})]:
        trainer = DeviceEpochTrainer(
            net=Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                              num_resblocks=4, upscale_factor=2,
                              dtype=jnp.bfloat16, unroll=5, **kw),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=optax.adam(1e-4), lr_data=lrbuf, hr_data=hrbuf,
            batch_size=8, patch=24, ratio=2, steps_per_epoch=STEPS,
            scan_unroll=1)
        trainer.train_epoch()  # compile + warm
        t0 = time.perf_counter()
        trainer.train_epoch()
        trainer.train_epoch()
        dt = (time.perf_counter() - t0) / 2
        print(f"{tag}: {STEPS / dt:7.1f} steps/s", flush=True)


if __name__ == "__main__":
    main()
