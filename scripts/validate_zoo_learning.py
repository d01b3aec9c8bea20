"""Zoo-wide learning validation on TPU: SRFBN, FRVSR, TOFlow, RBPN, EDVR.

Completes the per-net "does it actually LEARN on this hardware" evidence
(EDSR/DRFNet/DUF are covered by the other validate_* scripts): synthetic
beating-ring cine phantoms, real k-space degradation, a few hundred
device-trainer steps per net, held-out PSNR must beat bicubic.

Run: python scripts/validate_zoo_learning.py [net ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from validate_misr_learning import _MemMISRDataset  # noqa: E402
from validate_vsr_learning import synth_sequences  # noqa: E402


class _MemSISRDataset(_MemMISRDataset):
    def __getitem__(self, index: int, rng=None):
        lr, hr = self.augments(self.lr[index], self.hr[index], rng=rng)
        lr, hr = self.transforms(lr, hr)
        return {"lr_img": lr, "hr_img": hr, "index": index}


class _MemVSRDataset(_MemMISRDataset):
    def __getitem__(self, index: int, rng=None):
        lr, hr = self.augments(self.lr[index], self.hr[index], rng=rng)
        lr, hr = self.transforms(lr, hr)
        return {"lr_imgs": lr, "hr_imgs": hr, "index": index}


def _windows(lr, hr, win, center=None, whole=False):
    """(N, T, ...) sequences -> per-t circular windows (MISR center target
    unless whole=True, then full HR windows)."""
    n, t = lr.shape[:2]
    c = win // 2 if center is None else center
    lws, hts = [], []
    for i in range(n):
        for ti in range(t):
            idx = [(ti - c + k) % t for k in range(win)]
            lws.append(lr[i, idx])
            hts.append(hr[i, idx] if whole else hr[i, ti])
    return np.stack(lws)[..., None], np.stack(hts)[..., None]


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.data.loader import Dataloader
    from vsr_tpu.losses import FlowLoss, L1Loss
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import (
        Bicubic,
        EDVRNet,
        FRVSRNet,
        RBPNet,
        SRFBNet,
        TOFlowNet,
    )
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner import device_trainer as dt
    from vsr_tpu.utils.normalize import DATASET_STATS

    mean, std = DATASET_STATS["acdc"]
    psnr = PSNR()

    # --seed N offsets the data seeds (multi-seed re-validation of the
    # zoo learning deltas — BENCH.md round-4 lesson); --dtype bf16 /
    # bf16_carry trains every selected net at that policy (carry_f32
    # passed only to nets that have the knob).
    args = sys.argv[1:]
    seed = 0
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    dtype_tag = "f32"
    if "--dtype" in args:
        i = args.index("--dtype")
        dtype_tag = args[i + 1]
        del args[i:i + 2]
    net_kw: dict = {}
    if dtype_tag in ("bf16", "bf16_carry"):
        net_kw["dtype"] = jnp.bfloat16
    elif dtype_tag != "f32":
        raise SystemExit(f"--dtype must be f32|bf16|bf16_carry, got {dtype_tag}")

    def with_dtype(net_cls, **kwargs):
        kw = dict(kwargs, **net_kw)
        if dtype_tag == "bf16_carry":
            if "carry_f32" not in net_cls.__dataclass_fields__:
                raise SystemExit(f"{net_cls.__name__} has no carry_f32 knob")
            kw["carry_f32"] = True
        return net_cls(**kw)

    def make_data(factor):
        size, t = 96, 12
        hr_tr = synth_sequences(32, size, t, seed=seed * 100)
        hr_va = synth_sequences(6, size, t, seed=seed * 100 + 1)
        degrade = jax.jit(lambda x: kspace_downscale_jax(x, factor))
        lr_tr = np.asarray(degrade(hr_tr.reshape(-1, size, size))).reshape(
            32, t, size // factor, size // factor)
        lr_va = np.asarray(degrade(hr_va.reshape(-1, size, size))).reshape(
            6, t, size // factor, size // factor)
        return hr_tr, hr_va, lr_tr, lr_va

    def bicubic_psnr(lr_frames, hr_frames, factor):
        b = Bicubic(upscale_factor=factor)
        sr = np.asarray(b.apply({}, jnp.asarray(lr_frames)))
        return float(psnr(np.clip(np.round(sr), 0, 255), hr_frames))

    def train(trainer_cls, dataset, net, losses, weights, steps, batch, patch,
              ratio):
        trainer = trainer_cls(
            train_dataloader=Dataloader(dataset, batch_size=batch, shuffle=True),
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

    def infer_frames(net, variables, x, bn=False):
        kw = {"train": False} if bn else {}
        f = jax.jit(lambda z: net.apply(variables, z, **kw))
        z = (jnp.asarray(x) - mean) / (std + 1e-10)
        out = np.asarray(f(z).astype(jnp.float32))
        return np.clip(np.round(out * std + mean), 0, 255)

    report = {}

    def gate(name, model, base):
        delta = model - base
        report[name] = (model, base, delta)
        print(f"  {name}: {model:.3f} dB vs bicubic {base:.3f} dB "
              f"({delta:+.3f} dB)", flush=True)
        print(f"RESULT seed={seed} dtype={dtype_tag} net={name} "
              f"psnr={model:.3f} gain={delta:+.3f}", flush=True)
        assert delta > 0.1, f"{name} failed to beat bicubic"

    wanted = set(args) or {"srfbn", "frvsr", "toflow", "rbpn", "edvr"}

    if "srfbn" in wanted:
        print("== SRFBN (SISR x2, 3 feedback steps) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(2)
        lrf = lr_tr.reshape(-1, 48, 48)[..., None]
        hrf = hr_tr.reshape(-1, 96, 96)[..., None]
        ds = _MemSISRDataset(lrf, hrf)
        net = with_dtype(SRFBNet, in_channels=1, out_channels=1,
                         num_steps=3, num_features=24, num_groups=3,
                         upscale_factor=2)
        tr = train(dt.AcdcSISRSRFBDeviceTrainer, ds, net,
                   [L1Loss()], [1.0], steps=600, batch=8, patch=24, ratio=2)
        lv = lr_va.reshape(-1, 48, 48)[..., None]
        hv = hr_va.reshape(-1, 96, 96)[..., None]
        sr = infer_frames(net, tr.params, lv)[-1]  # last feedback step
        gate("SRFBN", float(psnr(sr, hv)), bicubic_psnr(lv, hv, 2))

    if "frvsr" in wanted:
        print("== FRVSR (VSR x4, 5-frame windows) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(4)
        lw, hw = _windows(lr_tr, hr_tr, 5, center=4, whole=True)
        ds = _MemVSRDataset(lw, hw)
        net = with_dtype(FRVSRNet, in_channels=1, out_channels=1,
                         upscale_factor=4, num_resblocks=5)
        tr = train(dt.AcdcFRVSRDeviceTrainer, ds, net,
                   [FlowLoss(), L1Loss()], [1.0, 1.0], steps=800, batch=8,
                   patch=16, ratio=4)
        lv, hv = _windows(lr_va, hr_va, 5, center=4, whole=True)
        z = (jnp.asarray(lv) - mean) / (std + 1e-10)
        f = jax.jit(lambda z: net.apply(tr.params, z)[0])
        sr = np.clip(np.round(np.asarray(f(z).astype(jnp.float32)) * std + mean), 0, 255)
        sr_last, hv_last = sr[:, -1], hv[:, -1]
        lv_last = lv[:, -1]
        gate("FRVSR", float(psnr(sr_last, hv_last)),
             bicubic_psnr(lv_last, hv_last, 4))

    if "toflow" in wanted:
        print("== TOFlow (MISR x2, 3 frames, SpyNet+BN) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(2)
        lw, hc = _windows(lr_tr, hr_tr, 3)
        ds = _MemMISRDataset(lw, hc)
        net = with_dtype(TOFlowNet, in_channels=1, out_channels=1, num_frames=3,
                        upscale_factor=2)
        tr = train(dt.AcdcMISRDeviceTrainer, ds, net, [L1Loss()], [1.0],
                   steps=600, batch=8, patch=16, ratio=2)
        lv, hv = _windows(lr_va, hr_va, 3)
        sr = infer_frames(net, tr.params, lv, bn=True)
        gate("TOFlow", float(psnr(sr, hv)),
             bicubic_psnr(lv[:, 1], hv, 2))

    if "rbpn" in wanted:
        print("== RBPN (MISR x2, 3 frames) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(2)
        lw, hc = _windows(lr_tr, hr_tr, 3)
        ds = _MemMISRDataset(lw, hc)
        net = with_dtype(RBPNet, in_channels=1, out_channels=1,
                         base_filter=32, feat=32, num_stages=3,
                         num_resblocks=2, num_frames=3, upscale_factor=2)
        tr = train(dt.AcdcMISRDeviceTrainer, ds, net, [L1Loss()], [1.0],
                   steps=600, batch=8, patch=16, ratio=2)
        lv, hv = _windows(lr_va, hr_va, 3)
        sr = infer_frames(net, tr.params, lv)
        gate("RBPN", float(psnr(sr, hv)), bicubic_psnr(lv[:, 1], hv, 2))

    if "edvr" in wanted:
        print("== EDVR (MISR x4, 5 frames, PCD+TSA) ==", flush=True)
        hr_tr, hr_va, lr_tr, lr_va = make_data(4)
        lw, hc = _windows(lr_tr, hr_tr, 5)
        ds = _MemMISRDataset(lw, hc)
        net = with_dtype(EDVRNet, in_channels=1, out_channels=1, nf=32,
                         nframes=5, groups=4, front_RBs=3, back_RBs=5)
        tr = train(dt.AcdcMISRDeviceTrainer, ds, net, [L1Loss()], [1.0],
                   steps=600, batch=8, patch=16, ratio=4)
        lv, hv = _windows(lr_va, hr_va, 5)
        sr = infer_frames(net, tr.params, lv)
        gate("EDVR", float(psnr(sr, hv)), bicubic_psnr(lv[:, 2], hv, 4))

    print("ZOO LEARNING VALIDATION:",
          {k: f"{d:+.2f} dB" for k, (m, b, d) in report.items()}, flush=True)


if __name__ == "__main__":
    main()
