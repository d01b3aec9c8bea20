"""Volumes-per-call sweep + achieved TFLOP/s for the volumetric serving
paths (Volume3DSRNet / Volume4DSRNet), on the chip.

The zoo rows (scripts/bench_zoo_serving.py) shipped at vpc=2 untuned; this
probe measures vpc in {1, 2, 4} and derives the conv FLOP rate from XLA
cost_analysis of the net apply alone (NOT the scanned 4D net's scan body —
cost_analysis counts lax.scan bodies once, so the 4D net's FLOPs are
computed from the 3D-equivalent per-step module times T).

Run: python scripts/probe_vol_serving.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import Volume3DSRNet, Volume4DSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    bf16 = jnp.bfloat16
    h, w = H // 2, W // 2
    nets = {
        "Volume3DSRNet": Volume3DSRNet(
            in_channels=1, out_channels=1, num_resblocks=8, num_features=32,
            upscale_factor=2, dtype=bf16),
        "Volume4DSRNet": Volume4DSRNet(
            in_channels=1, out_channels=1, num_features=32, num_resblocks=4,
            upscale_factor=2, dtype=bf16),
    }

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    for name, net in nets.items():
        vol4d = name.endswith("4DSRNet")
        example = (jnp.zeros((1, 2, 2, h, w, 1)) if vol4d
                   else jnp.zeros((1, 2, h, w, 1)))
        params = net.init(jax.random.PRNGKey(0), example)

        # FLOPs of one batch: lower the apply at the real serving shape.
        if vol4d:
            # cost_analysis counts the T-scan body ONCE — analyze one time
            # step via the 3D twin shape (1, 1, D, h, w, 1) and scale by T.
            sd = jax.ShapeDtypeStruct((1, 1, D, h, w, 1), jnp.float32)
            c = jax.jit(lambda z: net.apply(params, z)).lower(
                sd).compile().cost_analysis()
            flops_per_vol = float(c["flops"]) * T
        else:
            sd = jax.ShapeDtypeStruct((T, D, h, w, 1), jnp.float32)
            c = jax.jit(lambda z: net.apply(params, z)).lower(
                sd).compile().cost_analysis()
            flops_per_vol = float(c["flops"])
        print(f"{name}: ~{flops_per_vol / 1e12:.3f} TFLOP/volume "
              f"(cost_analysis)")

        for vpc in (1, 2, 4):
            def build_z(hr_frames, vpc=vpc):
                lr = kspace_downscale_jax(hr_frames, 2)
                z = ((lr - MEAN) / (STD + 1e-10))[..., None]
                vols = jnp.swapaxes(z.reshape(vpc, D, T, h, w, 1), 1, 2)
                return vols if vol4d else vols.reshape(vpc * T, D, h, w, 1)

            @jax.jit
            def pipeline(hr_frames, vpc=vpc, build_z=build_z):
                sr = net.apply(params, build_z(hr_frames))
                sr = sr.astype(jnp.float32)
                return jnp.clip(jnp.round(sr * STD + MEAN),
                                0, 255).astype(jnp.uint8)

            try:
                bufs = [jax.device_put(np.concatenate(
                    [make_volume(11 + vpc * i + j) for j in range(vpc)]))
                    for i in range(2)]
                jax.block_until_ready(bufs)
                t0 = time.time()
                jax.block_until_ready(pipeline(bufs[0]))
                compile_s = time.time() - t0
                t0 = time.perf_counter()
                outs = [pipeline(b) for b in bufs]
                jax.block_until_ready(outs)
                dt = time.perf_counter() - t0
                vps = 2 * vpc / dt
                tfs = vps * flops_per_vol / 1e12
                print(f"  vpc={vpc}: {vps:8.3f} vol/s  "
                      f"({tfs:6.1f} TFLOP/s conv rate)  "
                      f"[compile {compile_s:.0f}s]", flush=True)
            except Exception as exc:  # OOM etc.
                print(f"  vpc={vpc}: FAILED ({type(exc).__name__}: "
                      f"{str(exc)[:120]})", flush=True)


if __name__ == "__main__":
    main()
