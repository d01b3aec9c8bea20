"""Probe: can FRVSR's HR hat-matmul warp beat 20.4 TF/s with a different
contraction layout?

The round-3 trace (BENCH.md) shows FRVSR serving spends 41.6% of device
time in the HR warp of the previous SR estimate: per chunk the sampler is
one real matmul ``(P, H) x (H, W*C)`` with C=1, W=192 — the 192-wide lane
dim packs 1.5 of the MXU's 128-lane tiles (75%), and the hat operand
``relu(1-|g-i|)`` is generated inline ("generated-operand fusion throttles
the feed" per the trace). Variants, all exact to the baseline:

- ``baseline``   — ops/warp.py `_sample_matmul` as shipped.
- ``barrier``    — `optimization_barrier` between the hat generation and
                   the einsum, forcing XLA to materialize ry/rx instead of
                   fusing their generation into the matmul operand read.
- ``transposed`` — contract as ``img^T @ ry^T`` so the LARGE dim (P =
                   rows*W, a multiple of 384 = 3 exact lane tiles) rides
                   the lanes and W rides the sublanes.
- ``wide_rhs``   — batch the n grids' hat rows into ONE shared-RHS matmul
                   per image... only valid when all batch entries sample
                   the same image; skipped here (FRVSR warps per-sequence
                   images).

Timing: chained serial dependency + single readback (CLAUDE.md relay
rule). Run on the chip: ``python scripts/probe_warp_formulations.py``.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from vsr_tpu.ops.warp import flow_warp, hat, matmul_precision  # noqa: E402

B, H, W, C = 12, 192, 192, 1  # FRVSR zoo HR warp: D~12 sequences per call
ITERS = 300
REPS = 3  # take the median rep: sub-100ms timed regions are tunnel-noisy


def warp_baseline(img, flow):
    return flow_warp(img, flow, padding_mode="border")


def _grids(flow):
    h, w = flow.shape[1:3]
    ys = jnp.arange(h, dtype=flow.dtype).reshape(1, h, 1)
    xs = jnp.arange(w, dtype=flow.dtype).reshape(1, 1, w)
    gy = (ys + flow[..., 1]).astype(jnp.float32)
    gx = (xs + flow[..., 0]).astype(jnp.float32)
    gy = jnp.clip(gy, 0.0, float(h - 1))
    gx = jnp.clip(gx, 0.0, float(w - 1))
    return gy.reshape(flow.shape[0], -1), gx.reshape(flow.shape[0], -1)


def _hats(img, gy, gx):
    h, w = img.shape[1:3]
    iota_h = jnp.arange(h, dtype=jnp.float32)
    iota_w = jnp.arange(w, dtype=jnp.float32)
    ry = hat(gy[..., None] - iota_h)
    rx = hat(gx[..., None] - iota_w)
    # border mode: fold the virtual edge row (coords already clipped, so
    # only exact-boundary mass matters and it is already on the edge row).
    ry = ry + hat(gy - h)[..., None] * (iota_h == h - 1)
    rx = rx + hat(gx - w)[..., None] * (iota_w == w - 1)
    return ry.astype(img.dtype), rx.astype(img.dtype)


def warp_barrier(img, flow):
    """Materialize ry/rx via optimization_barrier before the contraction."""
    n, h, w, c = img.shape
    gy, gx = _grids(flow)
    ry, rx = _hats(img, gy, gx)
    ry, rx = jax.lax.optimization_barrier((ry, rx))
    prec = matmul_precision(img.dtype)
    rows = jnp.einsum("nph,nhwc->npwc", ry, img, precision=prec)
    out = jnp.einsum("npw,npwc->npc", rx, rows, precision=prec)
    return out.reshape(n, h, w, c)


def warp_transposed(img, flow):
    """Contract with P on the lanes: rows^T = img^T @ ry^T -> (n, w*c, P)."""
    n, h, w, c = img.shape
    gy, gx = _grids(flow)
    ry, rx = _hats(img, gy, gx)
    prec = matmul_precision(img.dtype)
    imt = img.reshape(n, h, w * c).transpose(0, 2, 1)  # (n, wc, h)
    rows_t = jnp.einsum("nwh,nph->nwp", imt, ry, precision=prec)  # lanes = P
    out = jnp.einsum("npw,nwp->np", rx, rows_t, precision=prec)
    # C=1 only in this probe; reduce over w with rx per-p.
    return out.reshape(n, h, w, c)


def warp_transposed_barrier(img, flow):
    n, h, w, c = img.shape
    gy, gx = _grids(flow)
    ry, rx = _hats(img, gy, gx)
    ry, rx = jax.lax.optimization_barrier((ry, rx))
    prec = matmul_precision(img.dtype)
    imt = img.reshape(n, h, w * c).transpose(0, 2, 1)  # (n, wc, h)
    rows_t = jnp.einsum("nwh,nph->nwp", imt, ry, precision=prec)
    out = jnp.einsum("npw,nwp->np", rx, rows_t, precision=prec)
    return out.reshape(n, h, w, c)


def time_chained(fn, img, flow):
    @jax.jit
    def step(carry):
        out = fn(img + (carry * 1e-12).astype(img.dtype), flow)
        return jnp.mean(out.astype(jnp.float32))

    carry = step(jnp.float32(0.0))
    ref = float(carry)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            carry = step(carry)
        final = float(carry)
        times.append(time.perf_counter() - t0)
    assert np.isfinite(final)
    return float(np.median(times)), ref


def main():
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, C)), jnp.bfloat16))
    flow = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, 2)) * 5.0, jnp.float32))
    jax.block_until_ready([img, flow])

    # Exactness gate first (f32 on this backend): all variants must agree.
    f32img = img.astype(jnp.float32)
    base = np.asarray(warp_baseline(f32img, flow))
    for name, fn in [("barrier", warp_barrier), ("transposed", warp_transposed),
                     ("trans+barr", warp_transposed_barrier)]:
        got = np.asarray(fn(f32img, flow))
        err = float(np.max(np.abs(got - base)))
        print(f"exactness {name}: max|diff| = {err:.3e}")
        assert err < 1e-4, name

    flops = 2 * B * (H * W) * H * (W * C) / 1e9  # the big contraction only
    results = {}
    for name, fn in [("baseline", warp_baseline), ("barrier", warp_barrier),
                     ("transposed", warp_transposed),
                     ("trans+barr", warp_transposed_barrier)]:
        dt, _ = time_chained(fn, img, flow)
        results[name] = dt
        print(f"{name:11s}: {dt:.3f} s / {ITERS} warps  "
              f"= {ITERS * flops / dt / 1e3:.1f} TF/s on the row contraction")
    best = min(results, key=results.get)
    print(f"best: {best}  ({results['baseline'] / results[best]:.2f}x vs baseline)")


if __name__ == "__main__":
    main()
