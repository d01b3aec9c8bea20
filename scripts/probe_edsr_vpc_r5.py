"""Round-5 re-sweep of the EDSR headline volumes-per-call (verdict item
#5b): the real-split k-space chain (round 4) changed the pipeline's
memory profile, so the vpc-4 bf16 / vpc-8 W8A8 optima need re-earning.

Differences from probe_edsr_vpc.py: groups are concatenated ON DEVICE
from 8 staged base volumes (no 0.5 GB re-transfer per vpc through the
relay), timing is the chained-in-jit scheme (probe_vol4d_timing.py:
matches independent+block to 0.3% and the trace span), and the sweep
covers vpc 8/12 where the int8 MXU kept scaling.

Run (chip): python scripts/probe_edsr_vpc_r5.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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

    base = [jax.device_put(_make_volume(i).reshape(D * T, H, W))
            for i in range(8)]
    for b in base:
        float(b.sum())  # real transfer sync

    z_cal = jax.jit(lambda v: ((kspace_downscale_jax(v, FACTOR)
                                - mean) / (std + 1e-10))[..., None])(base[0])
    act_scales = calibrate_w8a8(edsr, eparams, [z_cal])
    w8a8_apply = make_w8a8_apply(edsr, eparams, act_scales=act_scales)
    base_apply = lambda z: edsr.apply(eparams, z)

    def chained(apply_fn):
        @jax.jit
        def pipeline(hr_frames, carry):
            lr = kspace_downscale_jax(hr_frames + carry * 1e-12, FACTOR)
            z = (lr - mean) / (std + 1e-10)
            sr = apply_fn(z[..., None]).astype(jnp.float32)
            out = jnp.clip(jnp.round(sr * std + mean), 0, 255)[..., 0]
            out = out.astype(jnp.uint8)
            return out, out.astype(jnp.float32)[0, 0, 0] * 1e-12

        return pipeline

    for label, apply_fn, vpcs in [("bf16", base_apply, (2, 4, 6, 8)),
                                  ("w8a8", w8a8_apply, (4, 8, 12))]:
        pipe = chained(apply_fn)
        for vpc in vpcs:
            # Two distinct groups, concatenated on device.
            g = [jnp.concatenate([base[(i * vpc + j) % 8] for j in range(vpc)])
                 for i in range(2)]
            jax.block_until_ready(g)
            try:
                carry = jnp.float32(0.0)
                t0 = time.time()
                out, carry = pipe(g[0], carry)
                jax.block_until_ready((out, carry))
                compile_s = time.time() - t0
                iters = 6
                t0 = time.perf_counter()
                carry = jnp.float32(0.0)
                for i in range(iters):
                    out, carry = pipe(g[i % 2], carry)
                float(carry)
                dt = (time.perf_counter() - t0) / iters
                print(f"{label} vpc={vpc}: {vpc / dt:7.3f} vol/s "
                      f"[compile {compile_s:.0f}s]", flush=True)
            except Exception as exc:
                print(f"{label} vpc={vpc}: FAILED "
                      f"({type(exc).__name__}: {str(exc)[:140]})", flush=True)


if __name__ == "__main__":
    main()
