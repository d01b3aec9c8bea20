"""A/B the MoE dispatch implementations on the chip at the zoo protocol.

sparse: one-hot dispatch/combine einsums over capacity slots (GShard).
dense:  every expert's FFN on every token, gated-mask combine — no one-hot
        tensors; at E=4 the extra FFN FLOPs ~= the einsum FLOPs replaced.

Run: python scripts/probe_moe_dispatch.py
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

    from vsr_tpu.models import MoEEDSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    rng = np.random.default_rng(7)
    vol = jax.device_put(np.round(
        rng.random((D * T, H, W)) * 255).astype(np.float32))
    jax.block_until_ready(vol)
    factor, chunk = 2, 60

    variants = [("rank", "sparse"), ("rank", "dense"),
                ("rank", "dense_nhwc"),
                ("rank_pallas", "dense"), ("rank_pallas", "sparse"),
                ("radix1", "dense"), ("radix4", "dense"),
                ("radix8", "dense")]
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        variants = [v for v in variants if f"{v[0]}/{v[1]}" in only]
    for router, impl in variants:
        radix_bits = 4
        if router.startswith("radix") and router != "radix":
            radix_bits = int(router[len("radix"):])
        net = MoEEDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                         num_features=64, upscale_factor=2, num_experts=4,
                         group_size=256, moe_every=2, fused_tail=True,
                         router_impl=("radix" if router.startswith("radix")
                                      else router),
                         dispatch_impl=impl, radix_bits=radix_bits,
                         dtype=jnp.bfloat16)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, H // factor, W // factor, 1)))

        @jax.jit
        def pipeline(hr_frames, net=net, params=params):
            lr = kspace_downscale_jax(hr_frames, factor)
            z = ((lr - MEAN) / (STD + 1e-10))[..., None]
            zc = z.reshape(-1, chunk, *z.shape[1:])
            sr = jax.lax.map(lambda c: net.apply(params, c), zc)
            sr = sr.reshape(-1, *sr.shape[2:]).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255)[..., 0]

        t0 = time.time()
        out0 = pipeline(vol)
        jax.block_until_ready(out0)
        print(f"{router}/{impl}: compile+first {time.time() - t0:.1f}s",
              flush=True)
        iters = 3
        t0 = time.perf_counter()
        carry = jnp.float32(0.0)
        for _ in range(iters):
            out = pipeline(vol + carry * 1e-12)
            carry = out.astype(jnp.float32).ravel()[0] * 1e-12
        float(carry)
        dt = (time.perf_counter() - t0) / iters
        print(f"{router}/{impl}: {1 / dt:.3f} vol/s "
              f"({D * T / dt:.1f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
