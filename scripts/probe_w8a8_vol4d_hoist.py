"""Retry vol4d W8A8 now that hoist_tail changed the program shape.

Round-4 measured vol4d W8A8 at 0.60x — the in-scan quantize/dequant
pairs broke the hidden-volume scan-body fusion. hoist_tail moves the
(big-FLOP) upsample conv OUT of the scan into one batched call, which
is exactly the shape where static-scale W8A8 wins elsewhere. Variants:

  bf16       — hoisted baseline (the new shipped config)
  w8a8-tail  — quantize ONLY the hoisted 4f upconv (features==128
               filter; the scan body stays untouched bf16 — the
               SRFBN k6-only selective-W8A8 lesson applied here)
  w8a8-all   — every eligible conv incl. the scan body (the round-4
               failure mode, re-measured under the new shape)

Scales: CPU callback calibration (axon has no host callbacks) — run
  python scripts/probe_w8a8_vol4d_hoist.py --calibrate-only   (on CPU)
then the chip run loads /tmp/vol4d_hoist_w8a8_scales.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084
SCALES_PATH = "/tmp/vol4d_hoist_w8a8_scales.json"


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}"
                      + ("_w8a8cal" if jax.default_backend() == "cpu" else ""))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import Volume4DSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

    h, w = H // 2, W // 2
    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                        num_resblocks=4, upscale_factor=2,
                        dtype=jnp.bfloat16, hoist_tail=True)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, h, w, 1)))

    def make_volume(seed, vpc=1):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((vpc * D * T, H, W)) * 255).astype(
            np.float32)

    def build_z(hr_frames, vpc):
        lr = kspace_downscale_jax(hr_frames, 2)
        z = ((lr - MEAN) / (STD + 1e-10))[..., None]
        return jnp.swapaxes(z.reshape(vpc, D, T, h, w, 1), 1, 2)

    if "--calibrate-only" in sys.argv or jax.default_backend() == "cpu":
        cal = np.asarray(jax.jit(
            lambda f: build_z(f, 1))(make_volume(3)))[:, :6]
        scales = calibrate_w8a8(net, params, [cal], method="callback")
        with open(SCALES_PATH, "w") as f:
            json.dump(scales, f)
        print(f"{len(scales)} convs calibrated -> {SCALES_PATH}")
        if jax.default_backend() == "cpu":
            return
    with open(SCALES_PATH) as f:
        scales = json.load(f)
    print(f"{len(scales)} scales loaded", flush=True)

    psnr = PSNR()
    vpc = 4
    base = [jax.device_put(make_volume(11 + i)) for i in range(8)]
    for b in base:
        float(b.sum())
    groups = [jnp.concatenate([base[(i * vpc + j) % 8] for j in range(vpc)])
              for i in range(2)]
    hr_ref = np.concatenate([make_volume(11 + j) for j in range(vpc)])

    tail_only = lambda mod: int(mod.features) >= 128
    variants = [
        ("bf16", lambda z: net.apply(params, z)),
        ("w8a8-tail", make_w8a8_apply(net, params, act_scales=scales,
                                      conv_filter=tail_only)),
        ("w8a8-all", make_w8a8_apply(net, params, act_scales=scales)),
    ]
    out_b = None
    for tag, apply_fn in variants:
        def body(hr_frames, apply_fn=apply_fn):
            sr = apply_fn(build_z(hr_frames, vpc)).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255).astype(
                jnp.uint8)

        @jax.jit
        def pipeline(hr_frames, carry, body=body):
            out = body(hr_frames + carry * 1e-12)
            return out, out.astype(jnp.float32)[(0,) * out.ndim] * 1e-12

        carry = jnp.float32(0.0)
        t0 = time.time()
        out, carry = pipeline(groups[0], carry)
        jax.block_until_ready((out, carry))
        compile_s = time.time() - t0
        iters = 4
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for i in range(iters):
            out, carry = pipeline(groups[i % 2], carry)
        float(carry)
        dt = (time.perf_counter() - t0) / iters
        # Quality: (vpc,T,D,H,W,1) -> slice-major frames like hr_ref.
        o = np.asarray(jax.jit(body)(groups[0]), np.float32)
        frames = np.swapaxes(o, 1, 2).reshape(-1, H, W)
        p = float(psnr(frames[..., None], hr_ref[..., None]))
        if tag == "bf16":
            out_b = p
        print(f"{tag}: {vpc / dt:7.3f} vol/s  PSNR-vs-HR {p:.3f} dB "
              f"(delta {p - out_b:+.3f}) [compile {compile_s:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
