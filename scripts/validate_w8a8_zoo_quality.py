"""W8A8 quality on TRAINED recurrent/MISR nets (the zoo speedup winners).

validate_w8a8_quality.py pins the EDSR delta (−0.046 dB at 2000 steps);
this extends the trained-weight evidence to the two W8A8 zoo winners with
the most at stake quality-wise:

  - FRVSR (scan net, x4): the flow/warp recurrence could amplify int8
    noise frame over frame; scan-body convs are calibrated with
    method="callback" ON THE IN-PROCESS CPU BACKEND (jax.default_device)
    so the per-conv host callbacks never cross the axon relay.
  - RBPN (MISR x2): the deepest DBPN ladder (41 calibrated convs at zoo
    scale).

Each net trains a few hundred device-trainer steps on synthetic cine
phantoms (validate_zoo_learning.py recipe), then held-out PSNR is scored
for fp32 vs W8A8-static on the SAME inputs. Gate: |delta| < 0.1 dB.

Run: python scripts/validate_w8a8_zoo_quality.py [frvsr] [rbpn]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from validate_misr_learning import _MemMISRDataset  # noqa: E402
from validate_vsr_learning import synth_sequences  # noqa: E402
from validate_zoo_learning import _MemVSRDataset, _windows  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import FlowLoss, L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import FRVSRNet, RBPNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply
    from vsr_tpu.runner import device_trainer as dt
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    psnr = PSNR()

    def make_data(factor):
        size, t = 96, 12
        hr_tr = synth_sequences(32, size, t, seed=0)
        hr_va = synth_sequences(6, size, t, seed=1)
        degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
        lr_tr = np.asarray(degrade(hr_tr.reshape(-1, size, size))).reshape(
            32, t, size // factor, size // factor)
        lr_va = np.asarray(degrade(hr_va.reshape(-1, size, size))).reshape(
            6, t, size // factor, size // factor)
        return hr_tr, hr_va, lr_tr, lr_va

    def train(trainer_cls, dataset, net, losses, weights, steps, batch,
              patch, ratio):
        trainer = trainer_cls(
            train_dataloader=Dataloader(dataset, batch_size=batch,
                                        shuffle=True),
            valid_dataloader=None, net=net, loss_fns=losses,
            loss_weights=weights, metric_fns=[], optimizer=Adam(lr=5e-4),
            lr_scheduler=None, logger=None, monitor=None, num_epochs=1,
            patch=patch, ratio=ratio, steps_per_epoch=steps,
        )
        trainer._ensure_initialized()
        t0 = time.time()
        log, _, _ = trainer._run_epoch("training", 1)
        print(f"  {steps} steps in {time.time() - t0:.1f}s, "
              f"loss {log['Loss']:.5f}", flush=True)
        return trainer

    def score(apply_fn, z, hv, label, base=None):
        sr = np.asarray(jax.jit(apply_fn)(z).astype(jnp.float32))
        sr = np.clip(np.round(sr * std + mean), 0, 255)
        p = float(psnr(sr, hv))
        note = "" if base is None else f"  (delta {p - base:+.4f} dB)"
        print(f"  {label:24s} PSNR {p:.4f} dB{note}", flush=True)
        return p

    wanted = set(a.lower() for a in sys.argv[1:]) or {"frvsr", "rbpn"}
    failures = []

    if "frvsr" in wanted:
        print("== FRVSR x4 (scan net; callback calibration on the "
              "in-process CPU backend) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(4)
        lw, hw = _windows(lr_tr, hr_tr, 5, center=4, whole=True)
        ds = _MemVSRDataset(lw, hw)
        net = FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                       num_resblocks=5)
        tr = train(dt.AcdcFRVSRDeviceTrainer, ds, net,
                   [FlowLoss(), L1Loss()], [1.0, 1.0], steps=800, batch=8,
                   patch=16, ratio=4)
        lv, hv = _windows(lr_va, hr_va, 5, center=4, whole=True)
        z = jnp.asarray(((lv - mean) / (std + 1e-10)))
        base = score(lambda zz: net.apply(tr.params, zz)[0], z, hv, "fp32")

        t0 = time.time()
        with jax.default_device(jax.devices("cpu")[0]):
            cal = calibrate_w8a8(net, jax.device_get(tr.params),
                                 [np.asarray(z[:2])], method="callback")
        print(f"  callback-calibrated {len(cal)} convs on CPU "
              f"in {time.time() - t0:.1f}s", flush=True)
        p_q = score(
            lambda zz: make_w8a8_apply(net, tr.params, act_scales=cal)(zz)[0],
            z, hv, f"W8A8 static ({len(cal)} convs)", base)
        if abs(base - p_q) >= 0.1:
            failures.append(("FRVSR", base, p_q))

    if "rbpn" in wanted:
        print("== RBPN x2 (MISR ladder) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(2)
        lw, hc = _windows(lr_tr, hr_tr, 3)
        ds = _MemMISRDataset(lw, hc)
        net = RBPNet(in_channels=1, out_channels=1, base_filter=32, feat=32,
                     num_stages=3, num_resblocks=2, num_frames=3,
                     upscale_factor=2)
        tr = train(dt.AcdcMISRDeviceTrainer, ds, net, [L1Loss()], [1.0],
                   steps=600, batch=8, patch=16, ratio=2)
        lv, hv = _windows(lr_va, hr_va, 3)
        z = jnp.asarray(((lv - mean) / (std + 1e-10)))
        base = score(lambda zz: net.apply(tr.params, zz), z, hv, "fp32")
        cal = calibrate_w8a8(net, tr.params, [z])
        p_q = score(
            lambda zz: make_w8a8_apply(net, tr.params, act_scales=cal)(zz),
            z, hv, f"W8A8 static ({len(cal)} convs)", base)
        if abs(base - p_q) >= 0.1:
            failures.append(("RBPN", base, p_q))

    if failures:
        raise SystemExit(f"W8A8 trained-quality gate FAILED: {failures}")
    print("W8A8 ZOO QUALITY VALIDATION: OK (all deltas < 0.1 dB)")


if __name__ == "__main__":
    main()
