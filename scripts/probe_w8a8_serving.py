"""Chip probe: does W8A8 (int8 x int8 MXU convs, quantize.py) beat bf16
end to end at the bench's EDSR serving shape?

Context: scripts/probe_int8_conv.py measured the isolated 64-ch 3x3 conv
component at 1.97x bf16 when issued as s8 x s8 -> s32 (the v5e MXU int8
double rate + halved bandwidth). This probe measures the same question at
the bench.py pipeline level (k-space LR + EDSR-16/64 x2, 600-frame calls,
HBM-resident inputs, chained-timing-validated shape).

Run ON THE CHIP (default JAX_PLATFORMS=axon):
    python scripts/probe_w8a8_serving.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from vsr_tpu.models import EDSRNet
from vsr_tpu.preprocess.kspace import kspace_downscale_jax
from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

D, T, H, W = 10, 30, 192, 192
FACTOR = 2
VOLS = 8
MEAN, STD = 54.089, 48.084


def make_pipeline(apply_fn):
    @jax.jit
    def pipeline(hr_frames):
        lr = kspace_downscale_jax(hr_frames, FACTOR)
        z = (lr - MEAN) / (STD + 1e-10)
        sr = apply_fn(z[..., None]).astype(jnp.float32)
        out = jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]
        return out.astype(jnp.uint8)

    return pipeline


def timed(pipeline, buffers, n_volumes):
    jax.block_until_ready(pipeline(buffers[0]))
    start = time.perf_counter()
    outs = [pipeline(v) for v in buffers]
    jax.block_until_ready(outs)
    return n_volumes / (time.perf_counter() - start)


def main():
    rng = np.random.default_rng(0)
    pairs = [
        jax.device_put(np.round(
            rng.random((2 * D * T, H, W)) * 255).astype(np.float32))
        for _ in range(VOLS // 2)
    ]
    jax.block_until_ready(pairs)

    edsr = EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                   num_features=64, upscale_factor=FACTOR,
                   fused_tail=True, dtype=jnp.bfloat16)
    params = edsr.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))

    vps_bf16 = timed(make_pipeline(lambda z: edsr.apply(params, z)),
                     pairs, VOLS)
    print(f"bf16:           {vps_bf16:.3f} vol/s", flush=True)

    dyn = make_w8a8_apply(edsr, params)
    vps_dyn = timed(make_pipeline(dyn), pairs, VOLS)
    print(f"w8a8 dynamic:   {vps_dyn:.3f} vol/s ({vps_dyn / vps_bf16:.2f}x)",
          flush=True)

    # Calibrate on one normalized LR batch (same distribution as serving).
    # (jit: the eager complex64 cast in kspace is UNIMPLEMENTED on the relay)
    z0 = jax.jit(lambda v: ((kspace_downscale_jax(v, FACTOR) - MEAN)
                            / (STD + 1e-10))[..., None])(pairs[0])
    scales = calibrate_w8a8(edsr, params, [z0])
    print(f"calibrated {len(scales)} convs", flush=True)
    stat = make_w8a8_apply(edsr, params, act_scales=scales)
    vps_stat = timed(make_pipeline(stat), pairs, VOLS)
    print(f"w8a8 static:    {vps_stat:.3f} vol/s ({vps_stat / vps_bf16:.2f}x)",
          flush=True)

    # Quality at this exact shape: PSNR of w8a8 SR vs bf16 SR.
    ref = np.asarray(make_pipeline(lambda z: edsr.apply(params, z))(pairs[0]),
                     np.float64)
    for name, fn in (("dynamic", dyn), ("static", stat)):
        got = np.asarray(make_pipeline(fn)(pairs[0]), np.float64)
        mse = np.mean((ref - got) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / (mse + 1e-10))
        print(f"w8a8 {name} vs bf16 SR: PSNR {psnr:.2f} dB, "
              f"max|diff| {np.abs(ref - got).max():.0f}", flush=True)


if __name__ == "__main__":
    main()
