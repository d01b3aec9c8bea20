"""A/B the 4D volume net's time-scan unroll for training (chip).

Same argument as probe_scan_unroll_zoo.py, applied to Volume4DSRNet's
frame scan at the 4D training window (WIN=4 circular volume windows, the
validate_vol_learning.py protocol). scan_unroll=1 pins the trainer's
auto-unroll OFF for the baseline leg.

Run: python scripts/probe_vol4d_unroll.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

STEPS = 50


def main() -> None:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from validate_vol_learning import SIZE, TFRAMES, WIN, make_volumes
    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.data.transforms import compose
    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import Volume4DSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import Acdc4DSRDeviceTrainer

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"backend={jax.default_backend()}", flush=True)

    hr = make_volumes(6, seed=1)  # (N, T, D, H, W)
    n = hr.shape[0]
    degrade = jax.jit(lambda x: kspace_downscale_jax(x, 2))
    lr = np.asarray(degrade(hr.reshape(-1, SIZE, SIZE))).reshape(
        *hr.shape[:-2], SIZE // 2, SIZE // 2)

    class _MemDataset:
        def __init__(self, samples):
            self.samples = samples
            self.transforms = compose(None)
            self.augments = lambda *imgs, rng=None: imgs
            self.type = "train"

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i, rng=None):
            return {**self.samples[i], "index": i}

    samples = []
    for i in range(n):
        for t0 in range(TFRAMES):
            idx = [(t0 - WIN + 1 + k) % TFRAMES for k in range(WIN)]
            samples.append({
                "lr_vols": np.moveaxis(lr[i, idx], 1, -1)[..., None],
                "hr_vols": np.moveaxis(hr[i, idx], 1, -1)[..., None],
            })

    def measure(label, scan_unroll):
        tr = Acdc4DSRDeviceTrainer(
            train_dataloader=Dataloader(_MemDataset(samples), batch_size=4),
            valid_dataloader=None, net=Volume4DSRNet(
                in_channels=1, out_channels=1, num_features=16,
                num_resblocks=2, upscale_factor=2),
            loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=Adam(lr=3e-4), lr_scheduler=None, logger=None,
            monitor=None, num_epochs=1, patch=24, ratio=2,
            steps_per_epoch=STEPS, scan_unroll=scan_unroll)
        tr._ensure_initialized()
        t0 = time.perf_counter()
        tr._run_epoch("training", 1)  # compile
        compile_s = time.perf_counter() - t0
        best = 0.0
        for e in range(3):
            t0 = time.perf_counter()
            tr._run_epoch("training", e + 2)
            best = max(best, STEPS / (time.perf_counter() - t0))
        print(f"{label:28s} {best:7.1f} steps/s   (compile {compile_s:.0f} s)",
              flush=True)
        return best

    base = measure("scan (baseline)", 1)
    r = measure("unroll=WIN (auto)", "auto")
    print(f"    -> {r / base:.2f}x baseline", flush=True)


if __name__ == "__main__":
    main()
