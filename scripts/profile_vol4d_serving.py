"""Volume4DSRNet serving: device trace + tail-hoist attempt (round-4
verdict item #2 — "earn the vol4d ceiling the way EDVR earned its").

The shipped zoo row serves at 16 TF/s (~8% of bf16 peak) with a
surprising vpc=1 optimum. Two questions only a trace can answer:

1. Where does the time go inside the T-scan (conv vs the scan's
   per-step dynamic-slice/dynamic-update-slice HBM traffic vs layout
   copies)?
2. Why don't independent volumes' scans overlap at vpc=2 (the per-step
   batch doubles with the same step count, so throughput should scale)?

Attempt (measured below, same protocol): HOIST THE TAIL out of the
scan. Per scan step the module runs squeeze + 4 resblocks (recurrent)
AND the upsample tail (4f conv + pixel shuffle + out conv) which does
NOT feed the recurrence — only `new_hidden` does. Scanning the tail
serializes ~40% of the FLOPs at batch N=vpc; hoisting it stacks the
per-step hiddens and runs the tail ONCE batched over (T*N), exactly the
GPipe tail-hoist trick (parallel/pipeline.py). Numerics: identical
math per sample (convs are per-sample independent); verified < 1e-2
max abs grey delta and bit-rate printed.

Run (chip): python scripts/profile_vol4d_serving.py [trace]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D, T, H, W = 10, 30, 192, 192
MEAN, STD = 54.089, 48.084

from vsr_tpu.utils.profiling import summarize_trace as summarize  # noqa: E402


def main(args: list[str]) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/vsr_tpu_jax_cache_{jax.default_backend()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from vsr_tpu.models import Volume4DSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    bf16 = jnp.bfloat16
    h, w = H // 2, W // 2
    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                        num_resblocks=4, upscale_factor=2, dtype=bf16)
    example = jnp.zeros((1, 2, 2, h, w, 1))
    params = net.init(jax.random.PRNGKey(0), example)

    hoist = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                          num_resblocks=4, upscale_factor=2, dtype=bf16,
                          hoist_tail=True)

    def make_volume(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    def build(net_, vpc):
        def body(hr_frames):
            lr = kspace_downscale_jax(hr_frames, 2)
            z = ((lr - MEAN) / (STD + 1e-10))[..., None]
            vols = jnp.swapaxes(z.reshape(vpc, D, T, h, w, 1), 1, 2)
            sr = net_.apply(params, vols).astype(jnp.float32)
            return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255).astype(
                jnp.uint8)

        # Serial-dependency timing with the carry folded INSIDE the jit
        # (probe_vol4d_timing.py: agrees with independent+block timing to
        # 0.3% and with the device-trace wall span; eager ops between
        # calls — and pending buffer transfers, which block_until_ready
        # does NOT await through the relay — both depress naive timers).
        @jax.jit
        def pipeline(hr_frames, carry):
            out = body(hr_frames + carry * 1e-12)
            return out, out.astype(jnp.float32)[(0,) * out.ndim] * 1e-12

        return jax.jit(body), pipeline

    # ---- numerics: hoisted tail vs shipped, same params ----------------
    small = jnp.asarray(np.random.default_rng(3).random((1, 6, 4, 24, 24, 1)),
                        jnp.float32)
    a = net.apply(params, small).astype(jnp.float32)
    b = hoist.apply(params, small).astype(jnp.float32)
    d = jnp.max(jnp.abs(a - b))
    ga = jnp.clip(jnp.round(a * STD + MEAN), 0, 255)
    gb = jnp.clip(jnp.round(b * STD + MEAN), 0, 255)
    flips = float(jnp.mean((ga != gb).astype(jnp.float32)))
    print(f"hoist_tail numerics: max|d|={float(d):.2e} normalized units, "
          f"grey flips {flips * 100:.4f}%", flush=True)

    # ONE buffer set staged up front and awaited via a device-side
    # reduction readback (a real sync, unlike block_until_ready on
    # pending transfers through the relay).
    frames = {vpc: [jax.device_put(np.concatenate(
        [make_volume(11 + vpc * i + j) for j in range(vpc)]))
        for i in range(2)] for vpc in (1, 2, 4)}
    for bufs in frames.values():
        for b in bufs:
            float(b.sum())

    for tag, net_, vpcs in [("shipped", net, (1, 2, 4)),
                            ("hoist_tail", hoist, (1, 2, 4))]:
        for vpc in vpcs:
            once, pipeline = build(net_, vpc)
            bufs = frames[vpc]
            t0 = time.time()
            carry = jnp.float32(0.0)
            out, carry = pipeline(bufs[0], carry)
            jax.block_until_ready((out, carry))
            compile_s = time.time() - t0
            iters = 4
            t0 = time.perf_counter()
            carry = jnp.float32(0.0)
            for i in range(iters):
                out, carry = pipeline(bufs[i % 2], carry)
            float(carry)
            dt = (time.perf_counter() - t0) / iters
            print(f"{tag} vpc={vpc}: {vpc / dt:7.3f} vol/s "
                  f"[compile {compile_s:.0f}s]", flush=True)

            if "trace" in args and vpc in (1, 2):
                outdir = f"/tmp/vol4d_{tag}_vpc{vpc}_trace"
                with jax.profiler.trace(outdir):
                    jax.block_until_ready(once(bufs[0]))
                print(f"\n===== {tag} vpc={vpc} =====", flush=True)
                summarize(outdir)


if __name__ == "__main__":
    main(sys.argv[1:])
