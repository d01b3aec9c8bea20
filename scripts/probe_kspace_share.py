"""On-chip probe: what share of the headline EDSR pipeline is the k-space
LR-simulation stage (complex64 HIGHEST einsums + bicubic), and what do
cheaper precisions buy?

Timing uses the audited chained scheme: each call consumes the previous
call's output buffer (genuine serial dependency through HBM) and ONE value
is read back at the end (CLAUDE.md: per-iteration readbacks stall ~15 s
through the relay).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
FACTOR = 2
VPC = 4
REPS = 12


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vsr_tpu.models import EDSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax
    from vsr_tpu.preprocess.resize import resize_bicubic_jax

    mean, std = 54.089, 48.084
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((VPC * D * T, H, W), np.float32) * 255)
    base = jax.device_put(base)

    edsr = EDSRNet(in_channels=1, out_channels=1, num_resblocks=16,
                   num_features=64, upscale_factor=FACTOR, fused_tail=True,
                   dtype=jnp.bfloat16)
    params = edsr.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, H // FACTOR, W // FACTOR, 1)))

    def timed(fn, x0):
        f = jax.jit(fn)
        out = f(x0)
        jax.block_until_ready(out)
        start = time.perf_counter()
        x = x0
        for _ in range(REPS):
            x = f(x)
        float(jnp.mean(x[..., :1, :1]))  # one readback ends the chain
        return (time.perf_counter() - start) / REPS

    # Full pipeline: kspace -> EDSR -> paste back to HR-shaped output so
    # the chain can feed itself (same dtype/shape in and out).
    def full(hr):
        lr = kspace_downscale_jax(hr, FACTOR)
        z = (lr - mean) / (std + 1e-10)
        sr = edsr.apply(params, z[..., None]).astype(jnp.float32)
        return jnp.clip(jnp.round(sr[..., 0] * std + mean), 0, 255)

    # kspace-only (upsampled back with bicubic to keep shapes chainable —
    # that ADDS a bicubic, so also time the lowpass alone via round trip).
    def kspace_only(hr):
        lr = kspace_downscale_jax(hr, FACTOR)
        return jnp.repeat(jnp.repeat(lr, 2, -2), 2, -1)

    def net_only(hr):
        lr = hr[..., ::FACTOR, ::FACTOR]
        z = (lr - mean) / (std + 1e-10)
        sr = edsr.apply(params, z[..., None]).astype(jnp.float32)
        return jnp.clip(jnp.round(sr[..., 0] * std + mean), 0, 255)

    t_full = timed(full, base)
    t_k = timed(kspace_only, base)
    t_net = timed(net_only, base)
    n_vol = VPC
    print(f"full pipeline:  {t_full*1e3:8.1f} ms/call  "
          f"({n_vol / t_full:.2f} vol/s)")
    print(f"kspace stage:   {t_k*1e3:8.1f} ms/call  "
          f"({100 * t_k / t_full:.1f}% of full, incl. 2x2 repeat)")
    print(f"EDSR only:      {t_net*1e3:8.1f} ms/call  "
          f"({100 * t_net / t_full:.1f}% of full)")

    # Precision ladder for the frequency-domain einsums at this shape.
    from vsr_tpu.preprocess.kspace import kspace_lowpass_matrix

    # numpy constants, NOT device arrays: embedding a device-resident
    # complex64 array as a jit constant requires a device->host readback
    # that the axon relay reports UNIMPLEMENTED for.
    a_h = np.asarray(kspace_lowpass_matrix(H, FACTOR), np.complex64)
    a_w = np.asarray(kspace_lowpass_matrix(W, FACTOR), np.complex64)

    def lowpass(prec):
        def f(hr):
            x = hr.astype(jnp.complex64)
            low = jnp.einsum("oh,...hw->...ow", a_h, x, precision=prec)
            low = jnp.einsum("...hw,pw->...hp", low, a_w, precision=prec)
            low = jnp.round(jnp.abs(low))
            lr = resize_bicubic_jax(low, H // FACTOR, W // FACTOR)
            return jnp.repeat(jnp.repeat(
                jnp.clip(jnp.round(lr), 0., 255.), 2, -2), 2, -1)
        return f

    import jax.lax as lax
    outs = {}
    for name, prec in [("HIGHEST", lax.Precision.HIGHEST),
                       ("HIGH", lax.Precision.HIGH),
                       ("DEFAULT", lax.Precision.DEFAULT)]:
        t = timed(lowpass(prec), base)
        lr_val = jax.jit(lambda hr, p=prec: lowpass(p)(hr))(base)
        outs[name] = np.asarray(lr_val)
        print(f"kspace {name:8s}: {t*1e3:7.1f} ms/call")
    for name in ("HIGH", "DEFAULT"):
        diff = np.abs(outs[name] - outs["HIGHEST"])
        print(f"  {name} vs HIGHEST: max grey diff {diff.max():.1f}, "
              f"mean {diff.mean():.4f}, frac>0 {np.mean(diff > 0):.5f}")


if __name__ == "__main__":
    main()
