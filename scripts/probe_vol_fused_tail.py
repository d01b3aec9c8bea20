"""A/B the volumetric fused tail (fold the thin final conv through the
last 2D-in-3D shuffle) on chip, at the shipped zoo protocol.

Motivation (BENCH.md round 5): even hoisted, vol4d's out-conv (C_out=1,
3x3x3 at HR) runs at ~2.5 TF/s and the tail pays an HR 32-channel
intermediate + transposes. The folded form computes at LR spatial with
cin*r^2 -> cout*r^2 channels and never materializes the HR array
(exactness + tree identity pinned in tests/test_vol4d.py).

Run (chip): python scripts/probe_vol_fused_tail.py
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

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    base = [jax.device_put(make_volume(11 + i)) for i in range(8)]
    for b in base:
        float(b.sum())  # real transfer sync

    def run(tag, net, params, vpc, vol4d):
        def body(hr_frames):
            lr = kspace_downscale_jax(hr_frames, 2)
            z = ((lr - MEAN) / (STD + 1e-10))[..., None]
            vols = jnp.swapaxes(z.reshape(vpc, D, T, h, w, 1), 1, 2)
            zin = vols if vol4d else vols.reshape(vpc * T, D, h, w, 1)
            sr = net.apply(params, zin).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255).astype(
                jnp.uint8)

        @jax.jit
        def pipeline(hr_frames, carry):
            out = body(hr_frames + carry * 1e-12)
            return out, out.astype(jnp.float32)[(0,) * out.ndim] * 1e-12

        groups = [jnp.concatenate([base[(i * vpc + j) % 8]
                                   for j in range(vpc)]) for i in range(2)]
        jax.block_until_ready(groups)
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
        print(f"{tag} vpc={vpc}: {vpc / dt:7.3f} vol/s "
              f"[compile {compile_s:.0f}s]", flush=True)

    n3 = Volume3DSRNet(in_channels=1, out_channels=1, num_resblocks=8,
                       num_features=32, upscale_factor=2, dtype=bf16)
    p3 = n3.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, h, w, 1)))
    run("vol3d plain", n3, p3, 4, False)
    run("vol3d fused", n3.clone(fused_tail=True), p3, 4, False)

    n4 = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                       num_resblocks=4, upscale_factor=2, dtype=bf16,
                       hoist_tail=True)
    p4 = n4.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, h, w, 1)))
    run("vol4d hoist", n4, p4, 4, True)
    run("vol4d hoist+fused", n4.clone(fused_tail=True), p4, 4, True)


if __name__ == "__main__":
    main()
