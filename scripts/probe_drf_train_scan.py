"""A/B the DRFNet frame-scan lowering knobs for TRAINING throughput.

The round-3 training trace (scripts/profile_train_step.py drf) showed
25.9% of the flagship train step is "loop fusion" at 0.4 TF/s / 615 GB/s —
the backward pass's per-frame activation stash (the frame scan's
dynamic_update_slice stacking).  ``remat=True`` measured 0.94x (recompute
costs more than the stash traffic at T=5).  This probe tries the two
remaining lowering knobs, both exact (same ops, different schedule):

- ``unroll=T``: straight-line the T=5 training window — the stash becomes
  plain values XLA can fuse/concat instead of a dynamic_update_slice loop;
- ``split_transpose=True``: lower the backward as a separate scan.

Run: python scripts/probe_drf_train_scan.py
scan_unroll=1 pins the trainer's auto-unroll OFF so the net kwarg
alone controls the variant.
Timing: whole-epoch device scans (one dispatch, one readback) — the
trusted pattern from bench.py/profile_train_step.py.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = 50


def build(variant: dict):
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    return DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=64,
                   num_groups=6, upscale_factor=2, dtype=jnp.bfloat16,
                   **variant),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2,
        steps_per_epoch=STEPS, scan_unroll=1)


def measure(name: str, variant: dict) -> float:
    trainer = build(variant)
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.train_epoch()
        best = max(best, STEPS / (time.perf_counter() - t0))
    print(f"{name:28s} {best:7.1f} steps/s   (compile {compile_s:.0f} s)",
          flush=True)
    return best


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend={jax.default_backend()}", flush=True)
    base = measure("scan (baseline)", {})
    for name, variant in [
        ("unroll=5 (full window)", {"unroll": 5}),
        ("split_transpose", {"split_transpose": True}),
        ("unroll=5 + split_transpose", {"unroll": 5,
                                        "split_transpose": True}),
    ]:
        r = measure(name, variant)
        print(f"    -> {r / base:.2f}x baseline", flush=True)


if __name__ == "__main__":
    main()
