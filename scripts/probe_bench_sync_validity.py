"""Validate bench.py's timing methodology against serial-dependency timing.

Discovered while probing deconv lowering: through the axon relay,
``jax.block_until_ready`` can return without waiting (a 20-call conv chain
"finished" in 1 ms; forcing readback took minutes of queued work). That
puts every block_until_ready-based figure under suspicion. This probe
times the EXACT bench.py EDSR pipeline two ways:

  A. bench.py's scheme: dispatch all calls, block_until_ready(outs).
  B. chained scheme: each call consumes a scalar from the previous
     output, one readback at the end — a true serial lower bound.

If A ~= B the bench figures stand (dispatch happens to be effectively
synchronous for programs of this size); if A << B, bench.py must switch
to scheme B. Run: python scripts/probe_bench_sync_validity.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
FACTOR = 2
CALLS = 4  # = bench.py JAX_VOLUMES//2 calls of 2 volumes


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.models import EDSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    mean, std = 54.089, 48.084
    edsr = EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                   num_features=64, upscale_factor=FACTOR,
                   fused_tail=True, dtype=jnp.bfloat16)
    eparams = edsr.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))

    def body(hr_frames):
        lr = kspace_downscale_jax(hr_frames, FACTOR)
        z = (lr - mean) / (std + 1e-10)
        sr = edsr.apply(eparams, z[..., None]).astype(jnp.float32)
        out = jnp.clip(jnp.round(sr * std + mean), 0, 255)[..., 0]
        return out.astype(jnp.uint8)

    rng = np.random.default_rng(0)
    pairs = [jax.device_put(np.round(
        rng.random((2 * D * T, H, W)) * 255).astype(np.float32))
        for _ in range(CALLS)]
    jax.block_until_ready(pairs)

    # ---- scheme A: bench.py's pattern -----------------------------------
    pipe = jax.jit(body)
    jax.block_until_ready(pipe(pairs[0]))
    t0 = time.perf_counter()
    outs = [pipe(v) for v in pairs]
    jax.block_until_ready(outs)
    t_a = time.perf_counter() - t0

    # ---- scheme B: serial dependency + one readback ---------------------
    @jax.jit
    def step(v, carry):
        out = body(v + (carry * 1e-12).astype(v.dtype))
        return jnp.sum(out, dtype=jnp.float32)

    carry = step(pairs[0], jnp.float32(0.0))
    float(carry)  # compile + run outside timed region
    t0 = time.perf_counter()
    for v in pairs:
        carry = step(v, carry)
    final = float(carry)
    t_b = time.perf_counter() - t0
    assert np.isfinite(final)

    vols = 2 * CALLS
    print(f"A (bench.py block_until_ready): {t_a:.3f} s "
          f"-> {vols / t_a:.2f} vol/s")
    print(f"B (serial chain + readback)   : {t_b:.3f} s "
          f"-> {vols / t_b:.2f} vol/s")
    print(f"A/B ratio: {t_b / max(t_a, 1e-9):.2f}x")


if __name__ == "__main__":
    main()
