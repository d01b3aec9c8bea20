"""Probe: does an s8 x s8 -> s32 convolution hit the double-rate int8 MXU?

The v5e MXU multiplies int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOPS).
The serving zoo's conv-bound nets (RBPN 99.6% conv fusions at 52.8 TF/s,
TOFlow 97.5% at 41.4) would gain up to 2x IF XLA lowers
``conv_general_dilated(int8, int8, preferred_element_type=int32)`` onto
that path. This probe times the component conv at a representative zoo
chunk shape (60 frames of 192^2 x 64ch, 3x3) in four variants:

- ``bf16``      — the shipped serving dtype (component baseline).
- ``int8``      — s8 x s8 -> s32 conv, raw (no scales): the best case.
- ``int8+deq``  — the same conv followed by the per-channel scale multiply
                  and bf16 cast a real quantized layer needs.
- ``int8 dot``  — the 1x1-conv-as-dot_general formulation, to separate
                  "int8 conv unsupported" from "int8 MXU unsupported".

Timing: chained serial dependency + ONE readback (CLAUDE.md relay rule).
Run on the chip: ``python scripts/probe_int8_conv.py``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N, H, W, C = 60, 192, 192, 64  # zoo chunk shape; RBPN/EDSR HR conv class
K = 3
ITERS = 100
REPS = 3

DN = jax.lax.conv_dimension_numbers((N, H, W, C), (K, K, C, C),
                                    ("NHWC", "HWIO", "NHWC"))


def conv(x, w, **kw):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=DN, **kw)


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

    flops = 2 * N * H * W * K * K * C * C / 1e12  # TFLOP per conv

    # Inputs are explicit arguments (a large closure-captured operand gets
    # embedded into the serialized HLO and trips the remote-compile body
    # limit at bf16 sizes — HTTP 413).
    #
    # Serial dependency: every variant chains through the WEIGHT via
    # ``(carry != carry)`` — 0 for any finite carry but opaque to XLA's
    # algebraic simplifier (ne(x, x) is true for NaN, so it cannot fold),
    # and a scalar broadcast-add on the 36 KB weight is noise next to the
    # 141 MB activation conv. The first version of this probe rolled the
    # ACTIVATION by ``carry & 0``, which XLA folds to the identity — the
    # int8 chains were fictional (caught in review by reading the
    # optimized HLO: the carry parameter fed nothing).
    def chained(w, carry):
        return w + (carry != carry).astype(w.dtype)

    @jax.jit
    def step_bf16(carry, xb, wb):
        out = conv(xb, chained(wb, carry))
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_int8(carry, xq, wq):
        out = conv(xq, chained(wq, carry), preferred_element_type=jnp.int32)
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_int8_deq(carry, xq, wq):
        out = conv(xq, chained(wq, carry), preferred_element_type=jnp.int32)
        out = (out.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_qdq(carry, xb, wq):
        # The full W8A8 layer a real quantized net runs: quantize the bf16
        # activation per-tensor, int8 conv, dequantize to bf16.
        xs = jnp.float32(0.05)
        q = jnp.clip(jnp.round(xb.astype(jnp.float32) / xs), -127, 127)
        q = q.astype(jnp.int8)
        out = conv(q, chained(wq, carry), preferred_element_type=jnp.int32)
        out = (out.astype(jnp.float32) * (scale * xs)).astype(jnp.bfloat16)
        return jnp.mean(out.astype(jnp.float32))

    @jax.jit
    def step_int8_dot(carry, xq, wq):
        out = jax.lax.dot_general(
            xq.reshape(-1, C), chained(wq[0, 0], carry),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return jnp.mean(out.astype(jnp.float32))

    c0 = jnp.float32(0.0)
    for name, step, f, ops in [
            ("bf16      ", step_bf16, flops, (xb, wb)),
            ("int8      ", step_int8, flops, (xq, wq)),
            ("int8+deq  ", step_int8_deq, flops, (xq, wq)),
            ("w8a8 qdq  ", step_qdq, flops, (xb, wq)),
            ("int8 dot  ", step_int8_dot, flops / (K * K), (xq, wq))]:
        try:
            dt = time_chained(step, c0, *ops)
        except Exception as e:  # unsupported lowering shows up here
            print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")
            continue
        rate = ITERS * f / dt
        print(f"{name}: {dt:.3f} s / {ITERS} calls = {rate:.1f} T(FL)OP/s "
              f"({100 * rate / (394 if 'int8' in name else 197):.0f}% of "
              f"that dtype's MXU peak)")


if __name__ == "__main__":
    main()
