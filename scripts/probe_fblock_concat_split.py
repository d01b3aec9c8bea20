"""Probe: FBlock dense-ladder concats vs split-kernel sums.

The DRF serving trace shows ~8.5% of device time in `concatenate` (the
DBPN-style ladder concatenates all previous group outputs before each
1x1 conv / k6s2 deconv). Identity: conv(concat(xs), W) =
sum_j conv(x_j, W[:, :, off_j:off_j+c_j, :]) — no concat materialized,
same math. This times one FBlock-shaped ladder both ways at flagship
serving shapes with the serial-dependency scheme (one readback at end).

Run: python scripts/probe_fblock_concat_split.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N, H, W, F = 40, 48, 48, 64  # flagship LR 96/2... FBlock runs at LR 96x96
GROUPS = 6
ITERS = 30


def make_weights(rng):
    ws = {}
    for i in range(1, GROUPS):
        cin = (i + 1) * F
        ws[f"lr1x1_{i}"] = jnp.asarray(
            rng.standard_normal((1, 1, cin, F)) * 0.05, jnp.bfloat16)
        ws[f"hr1x1_{i}"] = jnp.asarray(
            rng.standard_normal((1, 1, (i + 1) * F, F)) * 0.05, jnp.bfloat16)
    ws["up"] = jnp.asarray(rng.standard_normal((6, 6, F, F)) * 0.05,
                           jnp.bfloat16)
    ws["down"] = jnp.asarray(rng.standard_normal((6, 6, F, F)) * 0.05,
                             jnp.bfloat16)
    ws["out"] = jnp.asarray(
        rng.standard_normal((1, 1, GROUPS * F, F)) * 0.05, jnp.bfloat16)
    return ws


def conv(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def deconv(x, w):
    return jax.lax.conv_transpose(
        x, w, (2, 2), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def ladder_concat(x, ws):
    lr_list, hr_list = [x], []
    for i in range(GROUPS):
        z = jnp.concatenate(lr_list, axis=-1)
        if i > 0:
            z = conv(z, ws[f"lr1x1_{i}"])
        hr = deconv(z, ws["up"])
        hr_list.append(hr)
        zh = jnp.concatenate(hr_list, axis=-1)
        if i > 0:
            zh = conv(zh, ws[f"hr1x1_{i}"])
        lr_list.append(conv(zh, ws["down"], stride=2, pad=2))
    return conv(jnp.concatenate(lr_list[1:], axis=-1), ws["out"])


def ladder_split(x, ws):
    def split_conv(parts, w):
        out, off = None, 0
        for p in parts:
            c = p.shape[-1]
            y = conv(p, w[:, :, off:off + c, :])
            out = y if out is None else out + y
            off += c
        return out

    lr_list, hr_list = [x], []
    for i in range(GROUPS):
        z = lr_list[0] if i == 0 else split_conv(lr_list, ws[f"lr1x1_{i}"])
        hr = deconv(z, ws["up"])
        hr_list.append(hr)
        zh = hr_list[0] if i == 0 else split_conv(hr_list, ws[f"hr1x1_{i}"])
        lr_list.append(conv(zh, ws["down"], stride=2, pad=2))
    return split_conv(lr_list[1:], ws["out"])


def time_chained(fn, x0, ws):
    @jax.jit
    def step(x, carry):
        out = fn(x + (carry * 1e-12).astype(x.dtype), ws)
        return jnp.mean(out.astype(jnp.float32))

    carry = step(x0, jnp.float32(0.0))
    float(carry)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        carry = step(x0, carry)
    final = float(carry)
    assert np.isfinite(final)
    return time.perf_counter() - t0


def main():
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.standard_normal((N, H, W, F)) * 0.1, jnp.bfloat16))
    ws = jax.device_put(make_weights(rng))
    jax.block_until_ready([x0, ws])

    # Equivalence check first (f32 weights would be exact; bf16 close).
    a = np.asarray(ladder_concat(x0, ws), np.float32)
    b = np.asarray(ladder_split(x0, ws), np.float32)
    err = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(a)))
    print(f"max rel err concat vs split: {err:.2e}")

    t_c = time_chained(ladder_concat, x0, ws)
    t_s = time_chained(ladder_split, x0, ws)
    print(f"concat ladder: {t_c:.3f} s ({ITERS} iters)")
    print(f"split ladder : {t_s:.3f} s ({ITERS} iters)")
    print(f"speedup: {t_c / t_s:.2f}x")


if __name__ == "__main__":
    main()
