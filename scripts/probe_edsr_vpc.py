"""A/B the EDSR headline pipeline's volumes-per-call (bf16 + W8A8).

bench.py serves 2 volumes (600 frames) per jitted call — the round-1 sweet
spot (batch 600 measured ~12% over batch 300). This probes whether 4 or 6
volumes per call buys more MXU utilization at the headline shape, for both
the bf16 primary series and the W8A8 variant. Run on the chip.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import BLOCKS, D, FACTOR, FEATURES, H, T, W, _make_volume  # noqa: E402


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.models import EDSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

    mean, std = 54.089, 48.084
    edsr = EDSRNet(in_channels=1, out_channels=1, num_resblocks=BLOCKS,
                   num_features=FEATURES, upscale_factor=FACTOR,
                   fused_tail=True, dtype=jnp.bfloat16)
    eparams = edsr.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))

    def make_pipeline(apply_fn):
        @jax.jit
        def pipeline(hr_frames):
            lr = kspace_downscale_jax(hr_frames, FACTOR)
            z = (lr - mean) / (std + 1e-10)
            sr = apply_fn(z[..., None]).astype(jnp.float32)
            out = jnp.clip(jnp.round(sr * std + mean), 0, 255)[..., 0]
            return out.astype(jnp.uint8)

        return pipeline

    n_total = 12  # volumes per timed sweep (divisible by 2, 4, 6)
    vols = [_make_volume(i).reshape(D * T, H, W) for i in range(n_total)]

    base_apply = lambda z: edsr.apply(eparams, z)
    z_cal = jax.jit(lambda v: ((kspace_downscale_jax(v, FACTOR)
                                - mean) / (std + 1e-10))[..., None])(
        jax.device_put(vols[0]))
    act_scales = calibrate_w8a8(edsr, eparams, [z_cal])
    w8a8_apply = make_w8a8_apply(edsr, eparams, act_scales=act_scales)

    for label, apply_fn in [("bf16", base_apply), ("w8a8", w8a8_apply)]:
        pipe = make_pipeline(apply_fn)
        for vpc in (2, 4, 6):
            bufs = [jax.device_put(np.concatenate(vols[i:i + vpc]))
                    for i in range(0, n_total, vpc)]
            jax.block_until_ready(bufs)
            jax.block_until_ready(pipe(bufs[0]))  # warm/compile
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [pipe(b) for b in bufs]
                jax.block_until_ready(outs)
                rates.append(n_total / (time.perf_counter() - t0))
            print(f"{label} vpc={vpc}: {np.median(rates):7.3f} vol/s "
                  f"(runs: {[round(r, 2) for r in rates]})", flush=True)


if __name__ == "__main__":
    main()
