"""W8A8 (int8-MXU) serving for the VOLUMETRIC nets (VERDICT r3 item #4).

vol3d is the repo's highest-MFU net (38% of bf16 peak at the zoo
protocol), making it the best int8 candidate: the double-rate int8 MXU
has the most headroom exactly where the bf16 pipeline is compute-bound.

- Volume3DSRNet: top-level 3D convs — calibrated with the standard
  jit-outputs method on the first batch, swept at vpc {2, 4, 8} (the int8
  MXU kept scaling past bf16's vpc optimum on EDSR — check here too).
- Volume4DSRNet: convs live in the T-scan body, so scales come from
  ``calibrate_w8a8(method="callback")`` (fires inside scan bodies).

Prints bf16 vs W8A8 vol/s and the PSNR delta between the two outputs on
the same synthetic volumes (the <0.5 dB gate the 2D zoo uses).

Run: python scripts/probe_w8a8_vol_serving.py [--calibrate-only]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084


def make_volume(seed, n=1):
    rng = np.random.default_rng(seed)
    return np.round(rng.random((n * D * T, H, W)) * 255).astype(np.float32)


def main() -> None:
    import jax

    backend = jax.default_backend()
    # CLAUDE.md cache rule: new CPU tools stay OFF the shared CPU cache
    # dir (mixed-machine-flag writers can poison it into hanging entries).
    cache = (f"/tmp/vsr_tpu_jax_cache_{backend}" if backend != "cpu"
             else "/tmp/vsr_tpu_jax_cache_cpu_probe_vol")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.metrics import PSNR
    from vsr_tpu.models import Volume3DSRNet, Volume4DSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.quantize import calibrate_w8a8, make_w8a8_apply

    h, w = H // 2, W // 2
    psnr = PSNR()

    def build_z(hr_frames, vpc, vol4d):
        lr = kspace_downscale_jax(hr_frames, 2)
        z = ((lr - MEAN) / (STD + 1e-10))[..., None]
        vols = jnp.swapaxes(z.reshape(vpc, D, T, h, w, 1), 1, 2)
        return vols if vol4d else vols.reshape(vpc * T, D, h, w, 1)

    def denorm(sr):
        return jnp.clip(jnp.round(sr.astype(jnp.float32) * STD + MEAN),
                        0, 255)

    def frames_order(sr, vpc):
        """Net-output stacks back to make_volume's slice-major (v, d, t)
        frame order — build_z regrouped to (v, t, d), so a plain
        reshape(-1, H, W) would compare every frame against the WRONG HR
        frame (review catch: that delta is insensitive to real
        quantization damage)."""
        sr = np.asarray(sr).reshape(vpc, T, D, H, W)
        return np.swapaxes(sr, 1, 2).reshape(-1, H, W)

    def measure(name, apply_fn, vpc, vol4d):
        @jax.jit
        def pipeline(hr_frames):
            return denorm(apply_fn(build_z(hr_frames, vpc, vol4d)))

        bufs = [jax.device_put(make_volume(11 + 7 * i, vpc))
                for i in range(2)]
        jax.block_until_ready(bufs)
        t0 = time.time()
        out0 = pipeline(bufs[0])
        jax.block_until_ready(out0)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        outs = [pipeline(b) for b in bufs]
        jax.block_until_ready(outs)
        vps = 2 * vpc / (time.perf_counter() - t0)
        print(f"  {name:24s} vpc={vpc}: {vps:8.3f} vol/s  "
              f"[compile {compile_s:.0f}s]", flush=True)
        return vps, np.asarray(outs[0])

    # ---------------------------------------------------------------- vol3d
    calibrate_only = "--calibrate-only" in sys.argv
    net3 = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                         num_features=32, upscale_factor=2,
                         dtype=jnp.bfloat16)
    params3 = net3.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, h, w, 1)))
    rows = {}
    if not calibrate_only:
      cal = np.asarray(jax.jit(
          lambda f: build_z(f, 1, False))(make_volume(3)))
      scales3 = calibrate_w8a8(net3, params3, [cal])
      print(f"vol3d: {len(scales3)} convs calibrated")
      print("Volume3DSRNet:")
      for vpc in (2, 4, 8):
        try:
            b, out_b = measure("bf16", lambda z: net3.apply(params3, z),
                               vpc, False)
            q, out_q = measure(
                "w8a8", make_w8a8_apply(net3, params3, act_scales=scales3),
                vpc, False)
            hr = make_volume(11, vpc).reshape(-1, H, W)[..., None]
            d_b = float(psnr(frames_order(out_b, vpc)[..., None], hr))
            d_q = float(psnr(frames_order(out_q, vpc)[..., None], hr))
            print(f"    -> w8a8 {q / b:.2f}x bf16, PSNR delta "
                  f"{d_q - d_b:+.3f} dB", flush=True)
            rows[vpc] = {"bf16": round(b, 3), "w8a8": round(q, 3),
                         "psnr_delta_db": round(d_q - d_b, 4)}
        except Exception as exc:
            print(f"    vpc={vpc} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:140]}", flush=True)

    # ---------------------------------------------------------------- vol4d
    net4 = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                         num_resblocks=4, upscale_factor=2,
                         dtype=jnp.bfloat16)
    params4 = net4.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 2, 2, h, w, 1)))
    # Scan-body convs: callback calibration. The axon relay does NOT
    # support host callbacks, so on a relay backend the scales come from
    # a CPU run of this script with --calibrate-only (writes the file).
    scales_path = "/tmp/vol4d_w8a8_scales.json"
    if "--calibrate-only" in sys.argv or jax.default_backend() == "cpu":
        cal4 = np.asarray(jax.jit(
            lambda f: build_z(f, 1, True))(make_volume(3)))[:, :6]
        scales4 = calibrate_w8a8(net4, params4, [cal4], method="callback")
        with open(scales_path, "w") as f:
            json.dump(scales4, f)
        print(f"vol4d: {len(scales4)} scan-body convs calibrated "
              f"(callback) -> {scales_path}")
        if "--calibrate-only" in sys.argv:
            return
    else:
        with open(scales_path) as f:
            scales4 = json.load(f)
        print(f"vol4d: {len(scales4)} scales loaded from {scales_path} "
              "(CPU callback calibration — run --calibrate-only on CPU "
              "first)")
    print("Volume4DSRNet:")
    for vpc in (1, 2):
        try:
            b, out_b = measure("bf16", lambda z: net4.apply(params4, z),
                               vpc, True)
            q, out_q = measure(
                "w8a8", make_w8a8_apply(net4, params4, act_scales=scales4),
                vpc, True)
            hr = make_volume(11, vpc).reshape(-1, H, W)[..., None]
            d_b = float(psnr(frames_order(out_b, vpc)[..., None], hr))
            d_q = float(psnr(frames_order(out_q, vpc)[..., None], hr))
            print(f"    -> w8a8 {q / b:.2f}x bf16, PSNR delta "
                  f"{d_q - d_b:+.3f} dB", flush=True)
            rows[f"4d_vpc{vpc}"] = {"bf16": round(b, 3), "w8a8": round(q, 3),
                                    "psnr_delta_db": round(d_q - d_b, 4)}
        except Exception as exc:
            print(f"    vpc={vpc} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:140]}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
