"""Probe: does an s8 x s8 -> s32 TRANSPOSED convolution hit the int8 MXU?

Companion to probe_int8_conv.py. The DBPN-ladder nets (SRFBN/DRFSISR/DRF,
RBPN) spend ~half their conv FLOPs in k6s2 ConvTranspose up-projections,
which the W8A8 interceptor currently leaves in bf16 (it intercepts nn.Conv
only). Zoo traces put those deconvs at ~44 TF/s (22% of the bf16 peak). If
``lax.conv_transpose(int8, int8, preferred_element_type=int32)`` lowers to
the double-rate int8 MXU like the forward conv does (1.97x, round-3 probe),
extending W8A8 to nn.ConvTranspose is worth it; if not, the ladder W8A8
story stays conv-only.

Shape: the DRF/SRFBN LR->HR projection class — 60 frames of 96^2 x 64ch,
kernel 6x6, stride 2 (SAME-equivalent torch padding 2 => xla pad 3).

Timing: chained serial dependency + ONE readback (CLAUDE.md relay rule).
Run on the chip: ``python scripts/probe_int8_deconv.py``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N, H, W, C = 60, 96, 96, 64  # LR ladder shape; output = 192^2 x 64
K, S, P = 6, 2, 2            # torch ConvTranspose2d(k=6, s=2, p=2)
XLA_PAD = [(K - 1 - P, K - 1 - P)] * 2
ITERS = 100
REPS = 3

# FLOPs: every input pixel contributes to k^2 output taps.
FLOPS = 2 * N * H * W * K * K * C * C / 1e12


def deconv(x, w, **kw):
    return jax.lax.conv_transpose(
        x, w, strides=(S, S), padding=XLA_PAD,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)


def time_chained(step, carry0, *operands):
    carry = step(carry0, *operands)
    jax.block_until_ready(carry)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry = step(carry, *operands)
        final = float(carry)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(final)
    return float(np.median(times))


def main():
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.standard_normal((N, H, W, C)), jnp.bfloat16))
    wb = jax.device_put(jnp.asarray(
        rng.standard_normal((K, K, C, C)) * 0.05, jnp.bfloat16))
    xq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (N, H, W, C)), jnp.int8))
    wq = jax.device_put(jnp.asarray(
        rng.integers(-127, 128, (K, K, C, C)), jnp.int8))
    scale = jax.device_put(jnp.asarray(
        rng.standard_normal(C) * 1e-4, jnp.float32))
    jax.block_until_ready([xb, wb, xq, wq, scale])

    # Serial dependency through the WEIGHT: (carry != carry) is 0 for any
    # finite carry but XLA cannot fold ne(x, x) for floats (NaN), so the
    # chain survives; the scalar broadcast-add on the 36 KB weight is
    # noise. (The previous roll-by-(carry & 0) chain was folded away —
    # see probe_int8_conv.py.)
    def chained(w, carry):
        return w + (carry != carry).astype(w.dtype)

    @jax.jit
    def step_bf16(carry, xb, wb):
        out = deconv(xb, chained(wb, carry))
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_int8(carry, xq, wq):
        out = deconv(xq, chained(wq, carry),
                     preferred_element_type=jnp.int32)
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_qdq(carry, xb, wq):
        # The full W8A8 layer: quantize the bf16 activation per-tensor,
        # int8 deconv, per-channel dequantize back to bf16.
        xs = jnp.float32(0.05)
        q = jnp.clip(jnp.round(xb.astype(jnp.float32) / xs), -127, 127)
        q = q.astype(jnp.int8)
        out = deconv(q, chained(wq, carry), preferred_element_type=jnp.int32)
        out = (out.astype(jnp.float32) * (scale * xs)).astype(jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32))

    c0 = jnp.float32(0.0)
    for name, step, ops in [
            ("bf16      ", step_bf16, (xb, wb)),
            ("int8      ", step_int8, (xq, wq)),
            ("w8a8 qdq  ", step_qdq, (xb, wq))]:
        try:
            dt = time_chained(step, c0, *ops)
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        rate = ITERS * FLOPS / dt
        print(f"{name}: {dt:.3f} s / {ITERS} calls = {rate:.1f} T(FL)OP/s "
              f"({100 * rate / (394 if '8' in name else 197):.0f}% of that "
              f"dtype's MXU peak)", flush=True)


if __name__ == "__main__":
    main()
