"""A/B scan ``unroll`` for TRAINING across the other scan nets.

Companion to scripts/probe_drf_train_scan.py (which measured DRFNet's
frame scan at +25% with unroll=5): the same activation-stash argument
applies to FRVSR's frame scan and to the feedback nets' num_steps scan
(SRFBN / DRFSISR, 4 steps in the reference configs).  Each variant is a
full device-epoch scan (one dispatch, one readback — the trusted timing
shape); unroll is exact (tests/test_models_feedback.py pins outputs and
grads bitwise/ulp).

Run: python scripts/probe_scan_unroll_zoo.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = 50


def measure(label, make_trainer):
    trainer = make_trainer()
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.train_epoch()
        best = max(best, STEPS / (time.perf_counter() - t0))
    print(f"{label:34s} {best:7.1f} steps/s   (compile {compile_s:.0f} s)",
          flush=True)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFSISRNet, FRVSRNet, SRFBNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    hr_vid = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    hr_img = np.round(rng.random((256, 64, 64, 1)) * 255).astype(np.float32)

    def vid_trainer(net):
        return lambda: DeviceEpochTrainer(
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=optax.adam(1e-4), lr_data=hr_vid[:, :, ::2, ::2],
            hr_data=hr_vid, batch_size=8, patch=32, ratio=2,
            steps_per_epoch=STEPS, scan_unroll=1)

    def img_trainer(net):
        return lambda: DeviceEpochTrainer(
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=optax.adam(1e-4), lr_data=hr_img[:, ::2, ::2],
            hr_data=hr_img, batch_size=16, patch=32, ratio=2,
            steps_per_epoch=STEPS, scan_unroll=1)

    frvsr = dict(in_channels=1, out_channels=1, upscale_factor=2,
                 is_prediction=True, dtype=jnp.bfloat16)
    base = measure("FRVSR scan (baseline)",
                   vid_trainer(FRVSRNet(**frvsr)))
    r = measure("FRVSR unroll=5",
                vid_trainer(FRVSRNet(**frvsr, unroll=5)))
    print(f"    -> {r / base:.2f}x baseline", flush=True)

    fb = dict(in_channels=1, out_channels=1, num_steps=4, num_features=64,
              num_groups=6, upscale_factor=2, dtype=jnp.bfloat16)
    for cls, name in [(SRFBNet, "SRFBN"), (DRFSISRNet, "DRFSISR")]:
        base = measure(f"{name} scan (baseline)", img_trainer(cls(**fb)))
        r = measure(f"{name} unroll=4", img_trainer(cls(**fb, unroll=4)))
        print(f"    -> {r / base:.2f}x baseline", flush=True)


if __name__ == "__main__":
    main()
