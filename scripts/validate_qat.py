"""QAT quality validation at the bench scale.

Extends scripts/validate_w8a8_quality.py: after training the bench's
EDSR-16/64 x2 and measuring the post-training-quantization (PTQ) W8A8
PSNR, fine-tune THROUGH the fake-quant forward (trainer ``qat`` option,
same static scales the deployed path serves) and re-score — the QAT
recovery is the measured value of the feature.

Two configurations per net:
  - production (min_channels=16: the shipped W8A8 eligibility — head/tail
    convs stay full precision, PTQ cost is already small);
  - stress (min_channels=2: quantizes the quality-critical narrow head and
    tail convs too, where PTQ visibly hurts — the configuration QAT exists
    for).

Run: python scripts/validate_qat.py  (defaults to the live backend; the
device-epoch trainer + W8A8 shapes are the cached bench shapes)
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
    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import EDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply
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

    def make_trainer(qat=None, lr=2e-4):
        return DeviceEpochTrainer(
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=Adam(lr=lr),
            lr_data=lr_train[..., None], hr_data=hr_train[..., None],
            batch_size=16, patch=32, ratio=factor, steps_per_epoch=50,
            qat=qat)

    trainer = make_trainer()
    t0 = time.time()
    for _ in range(40):
        log = trainer.train_epoch()
    print(f"pretrained 2000 steps in {time.time() - t0:.1f}s, "
          f"final loss {log['Loss']:.4f}", flush=True)
    params = trainer.params

    psnr = PSNR()
    z_val = jnp.asarray(((lr_val - mean) / (std + 1e-10))[..., None])

    def score(apply_fn):
        sr = np.asarray(jax.jit(apply_fn)(z_val), np.float32)
        sr = np.clip(np.round(sr * std + mean), 0, 255)
        return float(psnr(sr, hr_val[..., None]))

    base = score(lambda z: net.apply(params, z))
    print(f"fp32 baseline: {base:.4f} dB", flush=True)

    for label, min_ch in (("production (min_channels=16)", 16),
                          ("stress (min_channels=2)", 2)):
        cal = calibrate_w8a8(net, params, [z_val], min_channels=min_ch)
        w8a8 = lambda p: (lambda z: make_w8a8_apply(
            net, p, act_scales=cal, min_channels=min_ch)(z))
        ptq = score(w8a8(params))

        ft = make_trainer(qat={"act_scales": cal, "min_channels": min_ch},
                          lr=2e-5)
        ft.params = jax.tree_util.tree_map(jnp.asarray, params)
        ft.opt_state = ft.tx.init(ft.params["params"])
        t0 = time.time()
        for _ in range(10):
            ft_log = ft.train_epoch()
        qat_p = score(w8a8(ft.params))
        print(f"{label}: {len(cal)} convs calibrated\n"
              f"  PTQ  W8A8 {ptq:.4f} dB (delta {ptq - base:+.4f})\n"
              f"  QAT  W8A8 {qat_p:.4f} dB (delta {qat_p - base:+.4f}) "
              f"after 500 fine-tune steps in {time.time() - t0:.1f}s "
              f"(loss {ft_log['Loss']:.4f})\n"
              f"  recovered {qat_p - ptq:+.4f} dB", flush=True)
        assert qat_p >= ptq - 0.02, (label, ptq, qat_p)

    print("QAT VALIDATION: OK")


if __name__ == "__main__":
    main()
