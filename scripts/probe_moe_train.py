"""A/B the MoE routing/dispatch implementations in TRAINING on the chip.

Serving measured dense dispatch 2.06x over sort/sparse at E=4
(BENCH.md round 3), but the training gap — MoE EDSR-8/32 trains at ~80
steps/s vs 233 for its dense twin (validate_moe_learning.py protocol) —
was never attacked: the dispatch path doubles in the backward, so the
serving optimum need not transfer.

Protocol: DeviceEpochTrainer (whole-epoch lax.scan, one readback) on the
validate_moe_learning.py geometry — EDSR-8/32 + MoE every 2, E=4,
batch 16 of 32->64 patches — per (router_impl, dispatch_impl) variant.

Run: python scripts/probe_moe_train.py [rank/sparse rank/dense ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth_images(n: int, size: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = []
    for i in range(n):
        cx, cy, r = rng.random(3) * [0.6, 0.6, 0.25] + [0.2, 0.2, 0.08]
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r * r)))
        waves = np.sin(12 * (xx * rng.random() + yy * rng.random()))
        img = 140 * blob + 40 * waves + 60 * rng.random()
        imgs.append(np.clip(img, 0, 255))
    return np.round(np.stack(imgs)).astype(np.float32)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.losses import L1Loss
    from vsr_tpu.models import EDSRNet, MoEEDSRNet
    from vsr_tpu.optim import Adam
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.runner.device_trainer import DeviceEpochTrainer

    size, factor = 96, 2
    hr = synth_images(256, size, seed=0)
    lr = np.asarray(jax.jit(lambda x: kspace_downscale_jax(x, factor))(hr))

    # --wide: the zoo/flagship width (16 blocks x 64 features) where the
    # expert FFN dominates — dense dispatch's e/cf = 3.2x extra FFN FLOPs
    # should flip the sign vs the d=32 geometry.
    wide = "--wide" in sys.argv
    blocks, feats = (16, 64) if wide else (8, 32)

    variants = [("dense-twin", None), ("sort", "sparse"),
                ("rank", "sparse"), ("rank", "dense")]
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        variants = [v for v in variants if f"{v[0]}/{v[1]}" in only
                    or v[0] in only]

    for router, impl in variants:
        if impl is None:
            net = EDSRNet(in_channels=1, out_channels=1,
                          num_resblocks=blocks, num_features=feats,
                          upscale_factor=factor)
        else:
            net = MoEEDSRNet(in_channels=1, out_channels=1,
                             num_resblocks=blocks, num_features=feats,
                             upscale_factor=factor,
                             num_experts=4, group_size=256, moe_every=2,
                             router_impl=router, dispatch_impl=impl)
        trainer = DeviceEpochTrainer(
            net=net, loss_fns=[L1Loss()], loss_weights=[1.0], metric_fns=[],
            optimizer=Adam(lr=2e-4),
            lr_data=lr[..., None], hr_data=hr[..., None],
            batch_size=16, patch=32, ratio=factor, steps_per_epoch=100,
        )
        trainer.train_epoch()  # warm/compile
        t0 = time.perf_counter()
        n_epochs = 8
        log = None
        for _ in range(n_epochs):
            log = trainer.train_epoch()
        dt = time.perf_counter() - t0
        steps_s = n_epochs * 100 / dt
        label = f"{router}/{impl}" if impl else router
        print(f"{label:>16}: {steps_s:7.1f} steps/s "
              f"(loss {float(log['Loss']):.4f})", flush=True)


if __name__ == "__main__":
    main()
