"""Device-trace profile of the TRAINING step (VERDICT round-2 weak #1:
training had never been profiled; all MFU evidence was serving-side).

Traces one device-epoch program (lax.scan of sample -> augment -> fused
fwd/bwd/Adam) for the bench protocol EDSR-16/64 and for the flagship DRFNet
VSR trainer, prints the top device ops by self time, and reports achieved
TFLOP/s from XLA cost_analysis of the standalone step (the scan body counts
once in cost_analysis, so the per-step program is lowered separately — same
rule as bench.py's serving MFU).

Run: python scripts/profile_train_step.py [edsr|drf ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_TFLOPS = 197.0  # bf16 peak (v5e), same constant as bench.py


from vsr_tpu.utils.profiling import (  # noqa: E402
    compiled_flops as _flops_of, summarize_trace as summarize)



def profile_edsr() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    hrbuf = np.round(rng.random((256, 64, 64, 1)) * 255).astype(np.float32)
    trainer = DeviceEpochTrainer(
        net=EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                    num_features=64, upscale_factor=2, dtype=jnp.bfloat16),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, ::2, ::2],
        hr_data=hrbuf, batch_size=16, patch=32, ratio=2, steps_per_epoch=200)
    trainer.train_epoch()  # compile
    t0 = time.perf_counter()
    trainer.train_epoch()
    dt = time.perf_counter() - t0
    steps_s = 200 / dt
    f_step = _flops_of(
        jax.jit(lambda p, o, i, t: trainer._train_step(p, o, i, t)),
        trainer.params, trainer.opt_state,
        jnp.zeros((16, 32, 32, 1)), jnp.zeros((16, 64, 64, 1)))
    tf = f_step * steps_s / 1e12
    print(f"EDSR train: {steps_s:.0f} steps/s, {tf:.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:.0f}% of bf16 peak)", flush=True)
    with jax.profiler.trace("/tmp/edsr_train_trace"):
        trainer.train_epoch()
    print("\n===== EDSR-16/64 device training epoch =====")
    summarize("/tmp/edsr_train_trace")


def profile_drf() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import DRFNet
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    rng = np.random.default_rng(0)
    # VSR windows: (M, T, h, w, 1) raw frames, T=5 training windows.
    hrbuf = np.round(rng.random((64, 5, 64, 64, 1)) * 255).astype(np.float32)
    trainer = DeviceEpochTrainer(
        net=DRFNet(in_channels=1, out_channels=1, num_features=64,
                   num_groups=6, upscale_factor=2, dtype=jnp.bfloat16),
        loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
        optimizer=optax.adam(1e-4), lr_data=hrbuf[:, :, ::2, ::2],
        hr_data=hrbuf, batch_size=8, patch=32, ratio=2, steps_per_epoch=50)
    trainer.train_epoch()
    t0 = time.perf_counter()
    trainer.train_epoch()
    dt = time.perf_counter() - t0
    steps_s = 50 / dt
    f_step = _flops_of(
        jax.jit(lambda p, o, i, t: trainer._train_step(p, o, i, t)),
        trainer.params, trainer.opt_state,
        jnp.zeros((8, 5, 32, 32, 1)), jnp.zeros((8, 5, 64, 64, 1)))
    tf = f_step * steps_s / 1e12
    note = (" (NB: DRF scans frames internally — cost_analysis counts the "
            "frame body once; treat as a lower bound)" if f_step else "")
    print(f"DRF train: {steps_s:.1f} steps/s, {tf:.1f} TFLOP/s "
          f"({100 * tf / PEAK_TFLOPS:.0f}% of bf16 peak){note}", flush=True)
    with jax.profiler.trace("/tmp/drf_train_trace"):
        trainer.train_epoch()
    print("\n===== DRFNet-5x64 device training epoch =====")
    summarize("/tmp/drf_train_trace")


def main(names: list[str]) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for name in names or ["edsr", "drf"]:
        {"edsr": profile_edsr, "drf": profile_drf}[name]()


if __name__ == "__main__":
    main(sys.argv[1:])
