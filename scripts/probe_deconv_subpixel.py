"""Probe: is ConvTranspose (lhs-dilated conv) slower on TPU than its exact
sub-pixel reformulation (dense conv at LR + depth-to-space)?

The DBPN up-projections (SRFBN/DRFSISR/RBPN, k6 s2 p2 — reference
``srfb_net.py``/``rbp_net.py`` ladders) lower to lhs_dilation=2 convs; if
XLA-TPU multiplies the inserted zeros, 3/4 of the MXU work is waste and the
sub-pixel form (3x3 conv with 4x channels + depth-to-space) wins ~4x on
those layers. If XLA already canonicalizes the dilation away, the two run
at parity and we skip the rewrite.

Timing methodology (IMPORTANT, discovered here): through the axon relay
``block_until_ready`` can return without waiting for the computation, so
naive pipeline timing reports impossible numbers. This probe instead chains
a data dependency through every iteration (each call consumes a scalar
derived from the previous output) and forces ONE scalar readback at the
end — wall time is then a true lower bound on serial device execution,
with a single round-trip of readback latency amortized over ITERS.

Run: python scripts/probe_deconv_subpixel.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N, H, W, C = 8, 96, 96, 64
DEPTH = 6  # alternating up/down pairs like a DBPN ladder
ITERS = 20


def deconv_chain(x, wd, wc):
    for _ in range(DEPTH):
        y = jax.lax.conv_transpose(
            x, wd, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.lax.conv_general_dilated(
            y, wc, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x


def subpixel_chain(x, wu, wc):
    for _ in range(DEPTH):
        y = jax.lax.conv_general_dilated(
            x, wu, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, h, w, c4 = y.shape
        c = c4 // 4
        y = y.reshape(n, h, w, 2, 2, c)
        y = jnp.moveaxis(y, (3, 4), (2, 4))  # n,h,2,w,2,c
        y = y.reshape(n, h * 2, w * 2, c)
        x = jax.lax.conv_general_dilated(
            y, wc, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x


def time_chained(chain, x0, *weights):
    """Serially-dependent timing: call i+1 consumes a scalar from call i."""

    @jax.jit
    def step(x, carry):
        out = chain(x + (carry * 1e-12).astype(x.dtype), *weights)
        return jnp.mean(out.astype(jnp.float32))

    carry = step(x0, jnp.float32(0.0))
    float(carry)  # compile + one full execution outside the timed region
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = step(x0, carry)
    final = float(carry)  # single readback syncs the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((N, H, W, C)) * 0.1, jnp.bfloat16))
    wd = jax.device_put(
        jnp.asarray(rng.standard_normal((6, 6, C, C)) * 0.02, jnp.bfloat16))
    wc = jax.device_put(
        jnp.asarray(rng.standard_normal((6, 6, C, C)) * 0.02, jnp.bfloat16))
    wu = jax.device_put(
        jnp.asarray(rng.standard_normal((3, 3, C, 4 * C)) * 0.02, jnp.bfloat16))
    jax.block_until_ready([x0, wd, wc, wu])

    t_deconv = time_chained(deconv_chain, x0, wd, wc)
    t_subpix = time_chained(subpixel_chain, x0, wu, wc)
    # Useful FLOPs per up-layer are identical across forms by construction.
    gflop = 2 * N * (2 * H) * (2 * W) * 9 * C * C * DEPTH / 1e9  # up layers
    gflop += 2 * N * H * W * 36 * C * C * DEPTH / 1e9            # down layers
    print(f"deconv chain : {t_deconv:.3f} s  ({ITERS} pipelines, "
          f"{gflop * ITERS / t_deconv / 1e3:.1f} useful TFLOP/s)")
    print(f"subpixel chain: {t_subpix:.3f} s  ({ITERS} pipelines, "
          f"{gflop * ITERS / t_subpix / 1e3:.1f} useful TFLOP/s)")
    print(f"speedup: {t_deconv / t_subpix:.2f}x")


if __name__ == "__main__":
    main()
