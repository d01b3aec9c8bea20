"""Isolate the vol4d timing discrepancy: the shipped zoo row said 8.48
vol/s at vpc=1 (independent-call timing, block_until_ready), but the
chained-dependency scheme in profile_vol4d_serving.py measures 0.306
vol/s while the device trace shows only 107 ms of op time per call.

Three timers over the SAME shipped vpc=1 program:

A. independent calls + block_until_ready   (probe_vol_serving.py style)
B. chained, carry folded INSIDE the jit    (one dispatch per iteration,
   zero eager ops between calls — the cleanest serial-dependency timer)
C. chained via eager ops between calls     (profile_vol4d_serving.py
   style: astype/ravel/slice dispatches between pipelines)

If B agrees with A, the eager ops in C were the artifact and the zoo
number stands. If B agrees with C, A's number was fake for this program
(block_until_ready no-op pathology) and the zoo row must be re-measured.

Run (chip): python scripts/probe_vol4d_timing.py
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

    from vsr_tpu.models import Volume4DSRNet
    from vsr_tpu.preprocess.kspace import kspace_downscale_jax

    h, w = H // 2, W // 2
    net = Volume4DSRNet(in_channels=1, out_channels=1, num_features=32,
                        num_resblocks=4, upscale_factor=2,
                        dtype=jnp.bfloat16)
    example = jnp.zeros((1, 2, 2, h, w, 1))
    params = net.init(jax.random.PRNGKey(0), example)

    def body(hr_frames):
        lr = kspace_downscale_jax(hr_frames, 2)
        z = ((lr - MEAN) / (STD + 1e-10))[..., None]
        vols = jnp.swapaxes(z.reshape(1, D, T, h, w, 1), 1, 2)
        sr = net.apply(params, vols).astype(jnp.float32)
        return jnp.clip(jnp.round(sr * STD + MEAN), 0, 255).astype(jnp.uint8)

    pipeline = jax.jit(body)

    @jax.jit
    def pipeline_carry(hr_frames, carry):
        out = body(hr_frames + carry * 1e-12)
        return out, out.astype(jnp.float32)[0, 0, 0, 0, 0, 0] * 1e-12

    def vol(seed):
        rng = np.random.default_rng(seed)
        return np.round(rng.random((D * T, H, W)) * 255).astype(np.float32)

    bufs = [jax.device_put(vol(s)) for s in (11, 12, 13, 14)]
    jax.block_until_ready(bufs)
    jax.block_until_ready(pipeline(bufs[0]))
    c0 = jnp.float32(0.0)
    jax.block_until_ready(pipeline_carry(bufs[0], c0))

    # A: independent calls.
    t0 = time.perf_counter()
    outs = [pipeline(b) for b in bufs]
    jax.block_until_ready(outs)
    a = (time.perf_counter() - t0) / len(bufs)
    print(f"A independent+block: {1 / a:7.3f} vol/s ({a * 1e3:.0f} ms/call)",
          flush=True)

    # B: chained inside jit.
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(4):
        out, carry = pipeline_carry(bufs[i], carry)
    float(carry)
    b = (time.perf_counter() - t0) / 4
    print(f"B chained-in-jit:    {1 / b:7.3f} vol/s ({b * 1e3:.0f} ms/call)",
          flush=True)

    # C: chained via eager ops.
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for i in range(4):
        out = pipeline(bufs[i] + carry * 1e-12)
        carry = out.astype(jnp.float32).ravel()[0] * 1e-12
    float(carry)
    c = (time.perf_counter() - t0) / 4
    print(f"C chained-eager:     {1 / c:7.3f} vol/s ({c * 1e3:.0f} ms/call)",
          flush=True)

    # Device-trace wall span of two back-to-back independent calls: how
    # much device IDLE sits between/within programs vs the 107 ms op sum.
    outdir = "/tmp/vol4d_span_trace"
    with jax.profiler.trace(outdir):
        jax.block_until_ready([pipeline(bufs[0]), pipeline(bufs[1])])
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in tr.get("traceEvents", [])
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev]
    if ev:
        t_min = min(e["ts"] for e in ev)
        t_max = max(e["ts"] + e["dur"] for e in ev)
        print(f"trace: device wall span {(t_max - t_min) / 1e3:.0f} ms "
              f"for 2 calls", flush=True)


if __name__ == "__main__":
    main()
